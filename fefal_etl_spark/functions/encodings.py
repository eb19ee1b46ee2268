"""Categorical encodings (SURVEY.md §2.9 F8–F11).

The reference has three *distinct* sim/não encodings — the asymmetry is
deliberate and preserved:

- F8 ``transformar_valor`` (etl_ui.py:263-270): normalize first, then
  sim→1, nao→0, anything else (incl. non-string) → NULL.
- F9 ``map_disp`` (etl_ui.py:289-293): normalize first, sim→1, nao→0,
  anything else → -1 (tri-state; NULL input normalizes to "" → -1).
- F10 ``existe_responsavel`` map (etl_ui.py:408): plain lowercase (NO accent
  strip), "sim"→1, "não"→0 (accented!), else NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fefal_etl_spark.functions.text import normalize_text, ws_trim


def encode_sim_nao_null(col: Column) -> Column:
    """F8: sim→1, nao→0, else NULL (IntegerType). etl_ui.py:263-270."""
    norm = normalize_text(col)
    return (
        F.when(norm == "sim", F.lit(1))
        .when(norm == "nao", F.lit(0))
        .otherwise(F.lit(None))
        .cast("int")
    )


def encode_sim_nao_tristate(col: Column) -> Column:
    """F9: sim→1, nao→0, else -1 (IntegerType). etl_ui.py:289-293.

    The reference stringifies first (``str(val)``), so NULL → "nan"-ish → -1;
    we encode NULL → -1 to match.
    """
    norm = normalize_text(col)
    return (
        F.when(norm == "sim", F.lit(1))
        .when(norm == "nao", F.lit(0))
        .otherwise(F.lit(-1))
        .cast("int")
    )


def encode_existe_responsavel(col: Column) -> Column:
    """F10: lower(col)=="sim"→1, =="não" (accented)→0, else NULL.

    etl_ui.py:408 — note this path does NOT strip accents, unlike F8/F9; an
    unaccented "nao" maps to NULL here. Preserved deliberately.
    """
    low = F.lower(col.cast("string"))
    return (
        F.when(low == "sim", F.lit(1))
        .when(low == "não", F.lit(0))
        .otherwise(F.lit(None))
        .cast("int")
    )


def is_numeric_string(col: Column) -> Column:
    """F11: does the trimmed text parse as a number? (etl_ui.py:542-543).

    The reference uses ``texto.replace(".", "", 1).isdigit()`` — i.e. only
    non-negative decimal literals qualify (no sign, no exponent). We match
    with a regex rather than a cast so "-3" and "1e5" stay non-numeric.
    """
    return ws_trim(col).rlike(r"^[0-9]+(\.[0-9]+)?$|^\.[0-9]+$|^[0-9]+\.$")
