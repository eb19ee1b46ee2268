"""Driver-parity gate: the driver runs queries() on a DEFAULT Spark 4
session — ANSI mode ON — and canonicalizes results with pandas, which can
only sort/hash scalar cells.  Round 3 shipped two driver-red rows precisely
because the local gate was narrower than the driver environment
(`ab_test_ztest` threw DIVIDE_BY_ZERO under ANSI; `positional_index`
emitted an array column the driver's canonicalizer crashed on).

This module therefore sweeps the ENTIRE registry, not representatives:

* every query is BUILT + COLLECTED under ``spark.sql.ansi.enabled=true``
  at sf0.001 — no query may throw under the driver's default confs;
* every query's output schema must be scalar-only (no array/map/struct,
  no binary) — anything else is driver-incanonicalizable by construction.

If a future query genuinely needs a collection output, serialize it
(``array_join(sort_array(...), ',')``) as `positional_index` now does.
"""

import pytest
from pyspark.sql import types as T

from fefal_etl_spark.queries import get_queries

SF_DIR = "/root/testdata/sf0.001"

# the handful of 15-70 s rows (streaming micro-batch roundtrips, the
# pipeline-cache build) carry the slow marker so the default sweep fits
# the driver's verification window; they still run via -m slow
_SLOW_PARITY = {
    "txn_stream_sink_roundtrip",
    "mongo_config_pipeline",
    "table_changes_stream",
    "sparse_cosine_topk",
}
_ALL = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
    for n in sorted(get_queries())
]

_NONSCALAR = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


@pytest.fixture(scope="module")
def ansi_spark(spark):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", "false")


@pytest.mark.parametrize("name", _ALL)
def test_query_driver_parity(ansi_spark, name):
    """Build, schema-check, and fully materialize one registry query under
    the driver's session semantics."""
    df = get_queries()[name](ansi_spark, SF_DIR)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _NONSCALAR)]
    assert not bad, (
        f"{name} emits non-scalar column(s) {bad}: the driver's pandas "
        "canonicalizer cannot sort/hash them — serialize to string"
    )
    # collect() (not count()) so every column expression actually executes:
    # count() lets Spark prune projections whose evaluation would throw.
    rows = df.collect()
    assert len(rows) >= 0
    from fefal_etl_spark.cache import release_tracked

    release_tracked()
