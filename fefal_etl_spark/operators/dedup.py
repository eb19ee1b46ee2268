"""Window-based deduplication and the valid/duplicate/unmatched status fork
(SURVEY.md §2.5 W1–W3; §3 EP2 tail).

The reference forks its in-memory frame with boolean masks
(etl_ui.py:109-125). Distributed equivalent: compute a ``status`` column
once over a single cached DataFrame and filter per branch — one pass over
the data, three cheap filters, no recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROW_KEY = "__row_key"

STATUS_VALID = "valid"
STATUS_DUPLICATE = "duplicate"
STATUS_UNMATCHED = "unmatched"
STATUS_BLANK = "blank_name"


def with_row_key(df: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """W3 — materialize a deterministic row identity.

    The reference leans on pandas' positional RangeIndex (etl_ui.py:106-125,
    459). Spark rows are unordered, so the engine fixes identity at ingest:
    either an explicit order (``row_number`` over ``order_cols``) or, at
    scale, ``monotonically_increasing_id`` (partition-prefixed, no shuffle,
    unique but not dense — fine as a join key).
    """
    if order_cols:
        w = Window.orderBy(*order_cols)
        return df.withColumn(ROW_KEY, F.row_number().over(w).cast("long"))
    return df.withColumn(ROW_KEY, F.monotonically_increasing_id())


def dedup_keep_best(
    df: DataFrame,
    key: str | list[str],
    order_by: list | None = None,
    keep_col: str | None = None,
) -> DataFrame:
    """W2 — best-record dedup: one row per key, best by ``order_by``
    (etl_ui.py:201-213: sort by pct desc, tempo desc then keep first).

    Rows with a NULL key are all kept (the reference only dedups matched
    entities). If ``keep_col`` is given, instead of filtering, a boolean
    column is added (rank==1) so callers can route losers to a side output.

    Scale: one hash shuffle on ``key``; skew-safe under AQE skew-join
    handling; no sort of the whole relation (window sorts within key groups).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = order_by if order_by is not None else [F.lit(1)]
    w = Window.partitionBy(*keys).orderBy(*order)
    rk = F.row_number().over(w)
    null_key = None
    for k in keys:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    is_best = F.when(null_key, F.lit(True)).otherwise(rk == 1)
    if keep_col:
        return df.withColumn(keep_col, is_best)
    return df.withColumn("__is_best", is_best).filter(F.col("__is_best")).drop("__is_best")


def classify_rows(
    df: DataFrame,
    id_col: str = "id_entidade",
    blank_col: str | None = None,
    order_by: list | None = None,
    status_col: str = "status",
) -> DataFrame:
    """EP2 fork — add ``status`` ∈ {valid, duplicate, unmatched, blank_name}.

    Mirrors etl_ui.py:109-125: rows with NULL ``id_col`` are unmatched;
    among matched rows, all but the best per id are duplicates; the rest are
    valid. ``blank_col`` (pre-computed boolean) marks bad-name rows filtered
    even earlier (etl_ui.py:79). Invariant (etl_ui.py:1986):
    ``valid + duplicate + unmatched + blank_name == input rows``.

    The reference's W1 keeps the *first in file order* — nondeterministic
    under Spark's unordered model — so the engine adopts W2's best-record
    order (documented deviation, SURVEY.md §2.5); pass ``order_by`` to pin
    the ranking (defaults to the row key if present).
    """
    order = order_by
    if order is None:
        order = [F.col(ROW_KEY)] if ROW_KEY in df.columns else [F.lit(1)]
    # Skew guard: partitioning the window by id_col alone funnels EVERY
    # NULL-id (unmatched/blank) row into one hash partition — at scale the
    # unmatched residue can be a large fraction of the input. Their rank is
    # never consulted (status short-circuits on isNull before rk), so give
    # each NULL row its own partition key via the row key. The \x00 prefix
    # cannot collide with a stringified real id.
    if ROW_KEY in df.columns:
        part = F.coalesce(
            F.col(id_col).cast("string"),
            F.concat(F.lit("\x00"), F.col(ROW_KEY).cast("string")),
        )
    else:
        part = F.col(id_col)
    w = Window.partitionBy(part).orderBy(*order)
    rk = F.row_number().over(w)
    blank = F.col(blank_col) if blank_col else F.lit(False)
    status = (
        F.when(blank, F.lit(STATUS_BLANK))
        .when(F.col(id_col).isNull(), F.lit(STATUS_UNMATCHED))
        .when(rk == 1, F.lit(STATUS_VALID))
        .otherwise(F.lit(STATUS_DUPLICATE))
    )
    return df.withColumn(status_col, status)


def fork_by_status(
    df: DataFrame, status_col: str = "status"
) -> dict[str, DataFrame]:
    """Split a classified frame into per-status DataFrames over one cached
    parent (single upstream computation; etl_ui.py:116-125)."""
    cached = df.cache()
    return {
        s: cached.filter(F.col(status_col) == s)
        for s in (STATUS_VALID, STATUS_DUPLICATE, STATUS_UNMATCHED, STATUS_BLANK)
    }


def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup (extension E1 fast path): ``dropDuplicates`` — map-side
    partial dedup then one shuffle on the hashed key set."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()
