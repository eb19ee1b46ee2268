"""Manual-review loop operators (reference etl_ui.py:2001-2133):
promote_duplicate / assign_entity re-classification semantics."""

from pyspark.sql import functions as F

from fefal_etl_spark.operators.dedup import ROW_KEY, classify_rows, with_row_key
from fefal_etl_spark.operators.review import (
    REVIEW_PROMOTED,
    assign_entity,
    promote_duplicate,
)


def _classified(spark):
    rows = [
        # (id_entidade, score, name)
        (10, 90, "keep-a"),
        (10, 50, "dup-a"),
        (20, 80, "keep-b"),
        (None, 10, "lost-c"),
    ]
    df = with_row_key(
        spark.createDataFrame(rows, "id_entidade int, score int, name string")
    )
    return classify_rows(df, order_by=[F.col("score").desc(), F.col(ROW_KEY)])


def _statuses(df):
    return {r["name"]: r["status"] for r in df.collect()}


def test_promote_duplicate_swaps_valid(spark):
    frame = _classified(spark)
    promoted = frame.filter(F.col("name") == "dup-a").select(ROW_KEY)
    out = promote_duplicate(
        frame, promoted, order_by=[F.col("score").desc(), F.col(ROW_KEY)]
    )
    st = _statuses(out)
    assert st["dup-a"] == "valid"
    assert st["keep-a"] == "duplicate"
    assert st["keep-b"] == "valid"
    assert st["lost-c"] == "unmatched"


def test_promote_duplicate_idempotent_and_durable(spark):
    frame = _classified(spark)
    promoted = frame.filter(F.col("name") == "dup-a").select(ROW_KEY)
    order = [F.col("score").desc(), F.col(ROW_KEY)]
    once = promote_duplicate(frame, promoted, order_by=order)
    twice = promote_duplicate(once, promoted, order_by=order)
    assert _statuses(once) == _statuses(twice)
    # the promotion survives a later assign_entity re-classification
    fixes = once.filter(F.col("name") == "lost-c").select(
        ROW_KEY, F.lit(10).cast("int").alias("id_entidade")
    )
    after = assign_entity(once, fixes, order_by=order)
    st = _statuses(after)
    assert st["dup-a"] == "valid"  # durable despite lower score
    assert st["lost-c"] == "duplicate"  # joined entity 10, ranked below
    assert after.filter(F.col(REVIEW_PROMOTED)).count() == 1


def test_assign_entity_matches_new_row(spark):
    frame = _classified(spark)
    fixes = frame.filter(F.col("name") == "lost-c").select(
        ROW_KEY, F.lit(99).cast("int").alias("id_entidade")
    )
    out = assign_entity(
        frame, fixes, order_by=[F.col("score").desc(), F.col(ROW_KEY)]
    )
    st = _statuses(out)
    assert st["lost-c"] == "valid"  # sole row of entity 99
    assert out.filter(F.col("status") == "unmatched").count() == 0
    # preserves existing ids: nothing else moved
    assert st["keep-a"] == "valid" and st["dup-a"] == "duplicate"
