"""Manual-review loop operators (reference etl_ui.py:2001-2133).

The reference's Streamlit review screens let an operator (a) promote a
duplicate row to be the kept record for its entity (etl_ui.py:2001-2061) and
(b) assign an entity id to an unmatched row (etl_ui.py:2065-2133); both then
re-run the valid/duplicate/unmatched classification over the affected frame.

Engine shape: both are **pure, idempotent transforms** over the classified
frame. The reviewed overrides arrive as a (small, human-sized) DataFrame of
row keys — broadcast-joined onto the frame as a flag column — and the fork is
recomputed by the same ``classify_rows`` window with the override folded into
the ranking order. One broadcast join + one window shuffle, no driver
round-trips, safe to re-apply (applying the same override set twice yields
the same frame).

Promotions persist: the reference physically swaps rows between its valid
and duplicates tables, so a promotion must survive any later
re-classification. The engine encodes that as a durable ``review_promoted``
column which every review-loop re-classification ranks first — an
``assign_entity`` call after a promotion keeps the promoted row on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fefal_etl_spark.operators.dedup import (
    ROW_KEY,
    STATUS_BLANK,
    classify_rows,
)

REVIEW_PROMOTED = "review_promoted"


def _flag_rows(frame: DataFrame, keys: DataFrame, flag: str) -> DataFrame:
    """Mark rows whose ``ROW_KEY`` appears in ``keys`` (broadcast left join
    + indicator — a semi-join can't carry the flag)."""
    marks = keys.select(F.col(ROW_KEY)).distinct().withColumn("__mark", F.lit(True))
    out = frame.join(F.broadcast(marks), on=ROW_KEY, how="left")
    prior = F.col(flag) if flag in frame.columns else F.lit(False)
    return out.withColumn(
        flag, F.coalesce(F.col("__mark"), prior, F.lit(False))
    ).drop("__mark")


def _reclassify(
    frame: DataFrame, id_col: str, order_by: list | None, status_col: str
) -> DataFrame:
    """Recompute the status fork, honoring durable promotions and keeping
    blank-name rows in their branch (the reference never reviews those)."""
    order = list(order_by or [F.col(ROW_KEY).asc()])
    if REVIEW_PROMOTED in frame.columns:
        order = [F.col(REVIEW_PROMOTED).desc()] + order
    out = classify_rows(
        frame.withColumn("__was_blank", F.col(status_col) == STATUS_BLANK),
        id_col=id_col,
        blank_col="__was_blank",
        order_by=order,
        status_col=status_col,
    )
    return out.drop("__was_blank")


def promote_duplicate(
    frame: DataFrame,
    promoted: DataFrame,
    id_col: str = "id_entidade",
    order_by: list | None = None,
    status_col: str = "status",
) -> DataFrame:
    """Promote reviewed duplicate rows to ``valid`` (etl_ui.py:2001-2061).

    ``promoted`` carries the ``ROW_KEY`` values the reviewer chose. The fork
    is recomputed with promoted rows ranked FIRST within their entity, so the
    chosen row becomes ``valid`` and the previously-valid row demotes to
    ``duplicate`` in the same window pass. If several rows of one entity are
    promoted, ``order_by`` breaks the tie among them. The promotion is
    recorded in the ``review_promoted`` output column and survives later
    review-loop re-classifications. Idempotent.
    """
    flagged = _flag_rows(frame, promoted, REVIEW_PROMOTED)
    return _reclassify(flagged, id_col, order_by, status_col)


def assign_entity(
    frame: DataFrame,
    assignments: DataFrame,
    id_col: str = "id_entidade",
    order_by: list | None = None,
    status_col: str = "status",
) -> DataFrame:
    """Resolve reviewed unmatched rows to an entity id (etl_ui.py:2065-2133).

    ``assignments`` carries (``ROW_KEY``, ``id_col``) pairs — the reviewer's
    entity picks. The id is patched in (existing non-NULL ids are preserved;
    the reference only fixes unmatched rows) and the whole fork is
    recomputed: the fixed row now competes with the entity's existing rows
    under ``order_by``, exactly like the reference's re-classification —
    while rows promoted by an earlier review step stay on top.
    """
    picks = (
        assignments.select(
            F.col(ROW_KEY), F.col(id_col).alias("__assigned_id")
        ).distinct()
    )
    patched = frame.join(F.broadcast(picks), on=ROW_KEY, how="left")
    patched = patched.withColumn(
        id_col, F.coalesce(F.col(id_col), F.col("__assigned_id"))
    ).drop("__assigned_id")
    return _reclassify(patched, id_col, order_by, status_col)
