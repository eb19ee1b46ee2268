"""Temporal scalar functions (SURVEY.md §2.9 F12–F14, F18–F19).

Coercion semantics match pandas ``errors="coerce"`` — parse failures become
NULL — via ``try_to_timestamp`` so behavior is identical under ANSI mode
(Spark 4 default) and non-ANSI sessions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_timestamp_coerce(col: Column) -> Column:
    """F12: parse to timestamp, NULL on failure (etl_ui.py:192-193, 219-221)."""
    return F.try_to_timestamp(col.cast("string"))


def duration_seconds(start: Column, end: Column) -> Column:
    """F13: (end - start) in whole seconds; ≤ 0 → NULL (etl_ui.py:194-196).

    LongType, matching the reference's ``Int64`` cast of ``total_seconds()``.
    """
    secs = F.unix_timestamp(end) - F.unix_timestamp(start)
    return F.when(secs <= 0, F.lit(None)).otherwise(secs).cast("long")


def coalesce_submission(data_submissao: Column, data_fim: Column) -> Column:
    """F14: fill missing submission ts with the end ts (etl_ui.py:222)."""
    return F.coalesce(data_submissao, data_fim)


def format_date(col: Column) -> Column:
    """F18: ``%Y-%m-%d`` load-time formatting (etl_ui.py:422)."""
    return F.date_format(col, "yyyy-MM-dd")


def to_lisbon(col: Column) -> Column:
    """F19: UTC → Europe/Lisbon display conversion (etl_ui.py:1524-1527)."""
    return F.from_utc_timestamp(col, "Europe/Lisbon")
