"""Round-12 operator tests: schema DDL + maintenance verbs as SQL text
(VERDICT r11 items 1 and 6), the position-preserving rename, the
metadata-only type widening with read-side upcast, and the advice-r11
INSERT/generated-column and comment-scan fixes.

Every ALTER/OPTIMIZE/VACUUM/RESTORE form maps onto an EXISTING native
table verb — these tests pin the dispatcher contract (loud rejection
outside the subset, never a silent partial execution) and the few new
table.py surfaces (`alter_column_type`, `create_schema`)."""

import pytest

from fefal_etl_spark.table import (
    CommitConflict,
    ConstraintViolation,
    SchemaConflict,
    TransactionalTable,
)


def _wh(spark, tmp_path):
    from fefal_etl_spark.catalog import TableCatalog

    return TableCatalog(str(tmp_path / "wh"))


def _sql(spark, cat, stmt, **kw):
    from fefal_etl_spark.sql_dml import execute_sql

    return execute_sql(spark, stmt, catalog=cat, **kw)


# ----------------------------------------------------------------------
# column-definition CREATE TABLE
# ----------------------------------------------------------------------


def test_create_table_with_columns_declares_schema(spark, tmp_path):
    """CREATE TABLE (c TYPE, ...) commits a v0 schema declaration; the
    first INSERT is positionally cast against the DECLARATION (not
    adopted from the query), and DESCRIBE shows it immediately."""
    cat = _wh(spark, tmp_path)
    v = _sql(
        spark,
        cat,
        "CREATE TABLE t (k INT, name VARCHAR(20), p DOUBLE) "
        "PARTITIONED BY (name)",
    )
    assert v == 0
    desc = {
        r["col_name"]: r["data_type"]
        for r in _sql(spark, cat, "DESCRIBE t").collect()
    }
    assert desc == {"k": "int", "name": "string", "p": "double"}
    t = cat.table(spark, "t")
    assert t.current_partition_spec() == ["name"]
    # first INSERT: the BIGINT literal is cast DOWN to the declared
    # int, strings land as string — declaration wins over query schema
    _sql(spark, cat, "INSERT INTO t VALUES (CAST(1 AS BIGINT), 'a', 2.5)")
    # (read() order moves hive partition columns last — select by name)
    df = _sql(spark, cat, "SELECT k, name, p FROM t")
    assert dict(df.dtypes)["k"] == "int"
    assert [tuple(r) for r in df.collect()] == [(1, "a", 2.5)]
    # hive layout honors the declared spec from the very first row
    mf = t._read_manifest(t.latest_version())
    assert all("name=" in f for f in mf.files)


def test_create_table_columns_rejections(spark, tmp_path):
    from fefal_etl_spark.sql_dml import SqlDmlError

    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (k INT)")
    cases = [
        "CREATE TABLE t (k INT)",  # exists
        "CREATE OR REPLACE TABLE u (k INT)",  # replace needs a query
        "CREATE TABLE u (k INT NOT NULL)",  # column options
        "CREATE TABLE u (k INT PRIMARY KEY)",
        "CREATE TABLE u (k INT DEFAULT 0)",
        "CREATE TABLE u (k INT, k DOUBLE)",  # duplicate column
        "CREATE TABLE u (k WIBBLE)",  # unknown type
        "CREATE TABLE u (k INT) AS SELECT 1",  # columns AND query
        "CREATE TABLE u (k INT) PARTITIONED BY (missing)",
    ]
    for stmt in cases:
        with pytest.raises((SqlDmlError, ValueError)):
            _sql(spark, cat, stmt)
    # IF NOT EXISTS no-ops on the existing declaration
    assert _sql(spark, cat, "CREATE TABLE IF NOT EXISTS t (z INT)") is None
    desc = [r["col_name"] for r in _sql(spark, cat, "DESCRIBE t").collect()]
    assert desc == ["k"]


def test_create_schema_refuses_committed_table(spark, tmp_path):
    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(3).toDF("k"))
    with pytest.raises(CommitConflict):
        t.create_schema({"k": "bigint"})


# ----------------------------------------------------------------------
# ALTER TABLE dispatch
# ----------------------------------------------------------------------


def test_alter_rename_preserves_position(spark, tmp_path):
    """RENAME COLUMN must not move the column (round-12 fix: the
    metadata replay popped+re-added, silently re-ordering the schema
    and breaking later positional INSERTs)."""
    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (a INT, b STRING, c DOUBLE)")
    _sql(spark, cat, "INSERT INTO t VALUES (1, 'x', 1.5)")
    _sql(spark, cat, "ALTER TABLE t RENAME COLUMN b TO label")
    desc = [r["col_name"] for r in _sql(spark, cat, "DESCRIBE t").collect()]
    assert desc == ["a", "label", "c"]
    # positional INSERT still aligns mid-order
    _sql(spark, cat, "INSERT INTO t VALUES (2, 'y', 2.5)")
    rows = sorted(
        tuple(r) for r in _sql(spark, cat, "SELECT * FROM t").collect()
    )
    assert rows == [(1, "x", 1.5), (2, "y", 2.5)]


def test_alter_column_type_widen_metadata_only(spark, tmp_path):
    """ALTER COLUMN TYPE is a zero-rewrite widening: no data file
    changes, reads upcast the narrow physical files to the declared
    type, later narrow writes are rejected (the existing governance
    contract), and narrowing/redefining raise."""
    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (k INT, p FLOAT)")
    _sql(spark, cat, "INSERT INTO t VALUES (7, CAST(1.5 AS FLOAT))")
    t = cat.table(spark, "t")
    files_before = t._read_manifest(t.latest_version()).files
    _sql(spark, cat, "ALTER TABLE t ALTER COLUMN k TYPE BIGINT")
    _sql(spark, cat, "ALTER TABLE t ALTER COLUMN p TYPE DOUBLE")
    mf = t._read_manifest(t.latest_version())
    assert mf.files == files_before  # metadata-only — zero rewrite
    df = t.read()
    assert dict(df.dtypes) == {"k": "bigint", "p": "double"}
    assert [tuple(r) for r in df.collect()] == [(7, 1.5)]
    from fefal_etl_spark.sql_dml import SqlDmlError

    with pytest.raises(SchemaConflict):
        _sql(spark, cat, "ALTER TABLE t ALTER COLUMN k TYPE INT")  # narrow
    with pytest.raises(SchemaConflict):
        _sql(spark, cat, "ALTER TABLE t ALTER COLUMN p TYPE STRING")
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "ALTER TABLE t ALTER COLUMN k TYPE WIBBLE")
    # INSERT after the widen lands with the declared wide type
    _sql(spark, cat, "INSERT INTO t VALUES (8, 2.5)")
    got = _sql(spark, cat, "SELECT sum_k FROM (SELECT CAST(SUM(k) AS BIGINT) AS sum_k FROM t)")
    assert got.collect()[0][0] == 15


def test_alter_column_type_rebuilds_bloom(spark, tmp_path):
    """Widening int→double changes the string rendering bloom entries
    hash (`5` vs `5.0`), so the ALTER rebuilds the column's bloom —
    read_point must keep finding the value under the DECLARED type."""
    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.range(100).selectExpr("CAST(id AS INT) AS k", "id * 2 AS v")
    )
    t.build_bloom("k")
    t.alter_column_type("k", "double")
    # probe with the declared-type rendering: bloom was rebuilt, the
    # row is found (a stale bloom would silently skip every file)
    assert t.read_point("k", 5.0).count() == 1
    # bloom still PRUNES: a value absent from the table skips all files
    kept, total = t.skipped_files_bloom("k", 12345.0)
    assert total > 0 and kept == 0


def test_alter_constraint_and_properties_and_cluster(spark, tmp_path):
    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (k INT, p DOUBLE)")
    _sql(spark, cat, "INSERT INTO t VALUES (1, 10.0), (2, 20.0)")
    _sql(spark, cat, "ALTER TABLE t ADD CONSTRAINT pos CHECK (p > 0)")
    with pytest.raises(ConstraintViolation):
        _sql(spark, cat, "INSERT INTO t VALUES (3, -1.0)")
    # a constraint the existing data violates is rejected up front
    with pytest.raises(ConstraintViolation):
        _sql(spark, cat, "ALTER TABLE t ADD CONSTRAINT big CHECK (p > 15)")
    _sql(spark, cat, "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'etl')")
    t = cat.table(spark, "t")
    assert t._read_manifest(t.latest_version()).properties == {
        "owner": "etl"
    }
    _sql(spark, cat, "ALTER TABLE t UNSET TBLPROPERTIES ('owner')")
    assert not t._read_manifest(t.latest_version()).properties
    _sql(spark, cat, "ALTER TABLE t CLUSTER BY (k)")
    assert t._read_manifest(t.latest_version()).clustering == ["k"]
    _sql(spark, cat, "ALTER TABLE t CLUSTER BY NONE")
    assert not t._read_manifest(t.latest_version()).clustering


def test_alter_drop_column_and_rejections(spark, tmp_path):
    from fefal_etl_spark.sql_dml import SqlDmlError

    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (k INT, junk STRING)")
    _sql(spark, cat, "INSERT INTO t VALUES (1, 'x')")
    _sql(spark, cat, "ALTER TABLE t DROP COLUMN junk")
    assert _sql(spark, cat, "SELECT * FROM t").columns == ["k"]
    for bad in [
        "ALTER TABLE t ADD COLUMN z",  # missing type
        "ALTER TABLE t RENAME TO t2",
        "ALTER TABLE t SET PARTITION SPEC (k)",
        "ALTER TABLE missing DROP COLUMN k",
        "ALTER TABLE t DROP COLUMN",
    ]:
        with pytest.raises(SqlDmlError):
            _sql(spark, cat, bad)


# ----------------------------------------------------------------------
# OPTIMIZE / VACUUM / RESTORE as SQL
# ----------------------------------------------------------------------


def test_sql_maintenance_roundtrip(spark, tmp_path):
    """The scheduler script: small-file appends → bad batch → RESTORE
    undoes it → OPTIMIZE bin-packs → VACUUM trims dead dirs. The data
    is byte-identical to never having maintained; time travel to the
    kept window still works."""
    import os

    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t AS SELECT id AS k, id * 1.0 AS p FROM range(100)")
    for i in range(3):
        _sql(
            spark,
            cat,
            f"INSERT INTO t SELECT id + {100 + i * 100} AS k, "
            f"id * 1.0 AS p FROM range(100)",
        )
    _sql(spark, cat, "INSERT INTO t SELECT -id AS k, 0.0 AS p FROM range(5)")
    t = cat.table(spark, "t")
    assert t.read().count() == 405
    _sql(spark, cat, "RESTORE TABLE t TO VERSION AS OF 3")
    assert t.read().count() == 400
    n_files_before = len(t._read_manifest(t.latest_version()).files)
    v = _sql(spark, cat, "OPTIMIZE t")
    mf = t._read_manifest(v)
    assert len(mf.files) < n_files_before
    assert t.read().count() == 400
    removed = _sql(spark, cat, "VACUUM t RETAIN 2 VERSIONS")
    assert removed > 0  # the bad batch + pre-compact dirs are gone
    assert t.read().count() == 400
    assert t.read(v - 1).count() == 400  # kept window still travels
    # the vacuumed bad-batch bytes are really off disk: every parquet
    # file still on disk is referenced by one of the two kept versions
    on_disk = {
        f
        for _, _, files in os.walk(os.path.join(t.root, "data"))
        for f in files
        if f.endswith(".parquet")
    }
    live = {
        f.split("/")[-1]
        for f in mf.files + t._read_manifest(v - 1).files
    }
    assert on_disk == live


def test_sql_optimize_zorder_and_where(spark, tmp_path):
    from fefal_etl_spark.sql_dml import SqlDmlError

    cat = _wh(spark, tmp_path)
    _sql(
        spark,
        cat,
        "CREATE TABLE t PARTITIONED BY (b) AS "
        "SELECT id AS k, CAST(id % 3 AS STRING) AS b, id * 7 % 100 AS v "
        "FROM range(300)",
    )
    _sql(
        spark,
        cat,
        "INSERT INTO t SELECT id + 300, CAST(id % 3 AS STRING), "
        "id * 13 % 100 FROM range(300)",
    )
    t = cat.table(spark, "t")
    # partition-scoped OPTIMIZE touches only b=1 files
    before = t._read_manifest(t.latest_version()).files
    v = _sql(spark, cat, "OPTIMIZE t WHERE b = '1'")
    after = t._read_manifest(v).files
    assert {f for f in before if "b=0" in f} == {
        f for f in after if "b=0" in f
    }
    assert {f for f in before if "b=1" in f} != {
        f for f in after if "b=1" in f
    }
    # zorder rewrite via SQL; per-file stats then prune on BOTH dims
    v = _sql(spark, cat, "OPTIMIZE t ZORDER BY (k, v)")
    assert t.read(v).count() == 600
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "OPTIMIZE t WHERE b = '1' ZORDER BY (k)")
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "OPTIMIZE t WHERE b > '1'")
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "VACUUM t RETAIN VERSIONS")
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "RESTORE t TO VERSION latest")


# ----------------------------------------------------------------------
# advice-r11 fixes
# ----------------------------------------------------------------------


def test_insert_excludes_generated_partition_columns(spark, tmp_path):
    """Advice r11: generated/hidden partition columns are not
    positional INSERT targets — the transform re-derives them, so a
    row can never land with a partition value contradicting the
    declared transform."""
    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.range(10).selectExpr("id AS k", "id * 2.0 AS p"),
        generated={"bucket": "CAST(k % 4 AS INT)"},
    )
    from fefal_etl_spark.sql_dml import execute_sql

    # the query supplies ONLY the data columns; bucket is re-derived
    execute_sql(
        spark,
        "INSERT INTO t SELECT 100 AS k, 1.0 AS p",
        tables={"t": t},
    )
    row = [r for r in t.read().collect() if r["k"] == 100][0]
    assert row["bucket"] == 0
    mf = t._read_manifest(t.latest_version())
    added = [f for f in mf.files if mf.partitions.get(f, {}).get("bucket")]
    assert any("bucket=0" in f for f in added)
    # supplying a value for the generated column is an arity error —
    # loud, instead of silently bypassing the transform
    from fefal_etl_spark.sql_dml import SqlDmlError

    with pytest.raises(SqlDmlError):
        execute_sql(
            spark,
            "INSERT INTO t SELECT 101 AS k, 1.0 AS p, 3 AS bucket",
            tables={"t": t},
        )


def test_comments_do_not_register_or_confuse(spark, tmp_path):
    """Advice r11: a table named only inside a comment must not
    trigger view registration; statements may start with comments."""
    from fefal_etl_spark.sql_dml import execute_sql

    boom = str(tmp_path / "boom")  # no committed version: read() raises
    t_boom = TransactionalTable(spark, boom)
    df = spark.range(3).toDF("k")
    got = execute_sql(
        spark,
        """
        -- touches boom only here, and /* boom */ here
        SELECT count(*) AS n FROM good
        """,
        tables={"good": df, "boom": t_boom},
    )
    assert got.collect()[0]["n"] == 3
    # string literals survive comment stripping
    got = execute_sql(
        spark,
        "SELECT '--not a comment /*' AS s, count(*) AS n FROM good GROUP BY s",
        tables={"good": df},
    )
    assert got.collect()[0]["s"] == "--not a comment /*"


def test_alter_add_column_null_backfill(spark, tmp_path):
    """ADD COLUMN is a metadata-only commit: pre-add files surface the
    column as typed NULLs in declared order, later INSERTs must supply
    it (positional arity includes it), and a retired name cannot be
    re-added."""
    from fefal_etl_spark.sql_dml import SqlDmlError

    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (k INT, p DOUBLE)")
    _sql(spark, cat, "INSERT INTO t VALUES (1, 1.5)")
    t = cat.table(spark, "t")
    files_before = t._read_manifest(t.latest_version()).files
    _sql(spark, cat, "ALTER TABLE t ADD COLUMN vip INT")
    assert t._read_manifest(t.latest_version()).files == files_before
    desc = [r["col_name"] for r in _sql(spark, cat, "DESCRIBE t").collect()]
    assert desc == ["k", "p", "vip"]
    # pre-add rows read back with typed NULL in declared position
    df = t.read()
    assert dict(df.dtypes)["vip"] == "int"
    assert [tuple(r) for r in df.collect()] == [(1, 1.5, None)]
    # old 2-column INSERT arity now rejects; 3-column lands
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "INSERT INTO t VALUES (2, 2.5)")
    _sql(spark, cat, "INSERT INTO t VALUES (2, 2.5, 7)")
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, 1.5, None), (2, 2.5, 7)]
    # multi-column form + duplicate/retired rejections
    _sql(spark, cat, "ALTER TABLE t ADD COLUMNS (a STRING, b BIGINT)")
    desc = [r["col_name"] for r in _sql(spark, cat, "DESCRIBE t").collect()]
    assert desc == ["k", "p", "vip", "a", "b"]
    with pytest.raises(SchemaConflict):
        _sql(spark, cat, "ALTER TABLE t ADD COLUMN vip INT")
    _sql(spark, cat, "ALTER TABLE t DROP COLUMN a")
    with pytest.raises(SchemaConflict):
        _sql(spark, cat, "ALTER TABLE t ADD COLUMN a STRING")  # retired


def test_review_r12_fixes(spark, tmp_path):
    """Pins for the round-12 review findings: atomic multi-item ALTER
    statements, no phantom binding on failed CREATE, numeric OPTIMIZE
    values, comments inside double-quoted literals, and SELECT from a
    declared-but-empty table."""
    from fefal_etl_spark.sql_dml import SqlDmlError, execute_sql

    cat = _wh(spark, tmp_path)
    _sql(spark, cat, "CREATE TABLE t (k INT, p DOUBLE)")
    # SELECT from the declared-but-empty table: empty typed relation,
    # not TABLE_OR_VIEW_NOT_FOUND
    got = _sql(spark, cat, "SELECT k, p FROM t")
    assert got.count() == 0 and dict(got.dtypes) == {"k": "int", "p": "double"}
    _sql(spark, cat, "INSERT INTO t VALUES (1, 1.0)")
    t = cat.table(spark, "t")
    v0 = t.latest_version()
    # ADD COLUMNS with an internal duplicate: statement rejects and
    # NOTHING commits (atomicity)
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "ALTER TABLE t ADD COLUMNS (a INT, a STRING)")
    assert t.latest_version() == v0
    # multi-pair SET TBLPROPERTIES = ONE commit
    _sql(spark, cat, "ALTER TABLE t SET TBLPROPERTIES ('a'='1', 'b'='2')")
    assert t.latest_version() == v0 + 1
    assert t._read_manifest(v0 + 1).properties == {"a": "1", "b": "2"}
    # malformed second pair: nothing applied
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "ALTER TABLE t SET TBLPROPERTIES ('c'='3', broken)")
    assert t.latest_version() == v0 + 1
    _sql(spark, cat, "ALTER TABLE t UNSET TBLPROPERTIES ('a', 'b')")
    assert not t._read_manifest(t.latest_version()).properties
    # failed column-definition CREATE leaves NO binding; retry works
    with pytest.raises(SqlDmlError):
        _sql(spark, cat, "CREATE TABLE u (k INT) PARTITIONED BY (zz)")
    assert "u" not in cat.tables()
    _sql(spark, cat, "CREATE TABLE u (k INT)")
    assert "u" in cat.tables()
    # comments inside double-quoted string literals survive
    df = spark.range(2).toDF("k")
    got = execute_sql(
        spark, 'SELECT "a -- b /* c" AS s FROM good LIMIT 1',
        tables={"good": df},
    )
    assert got.collect()[0]["s"] == "a -- b /* c"


def test_optimize_numeric_where_and_incremental(spark, tmp_path):
    """OPTIMIZE accepts unquoted numeric partition values, and plain
    OPTIMIZE is incremental: files at/above the packing target are
    retained verbatim."""
    import os

    cat = _wh(spark, tmp_path)
    _sql(
        spark,
        cat,
        "CREATE TABLE t PARTITIONED BY (y) AS "
        "SELECT id AS k, CAST(2024 + id % 2 AS INT) AS y FROM range(100)",
    )
    _sql(spark, cat, "INSERT INTO t SELECT id + 100, CAST(2024 AS INT) FROM range(50)")
    t = cat.table(spark, "t")
    before = t._read_manifest(t.latest_version()).files
    v = _sql(spark, cat, "OPTIMIZE t WHERE y = 2024")
    after = t._read_manifest(v).files
    assert {f for f in before if "y=2025" in f} == {
        f for f in after if "y=2025" in f
    }
    assert {f for f in before if "y=2024" in f} != {
        f for f in after if "y=2024" in f
    }
    # plain OPTIMIZE is INCREMENTAL: after it, every partition is one
    # packed file, and the total row count is untouched
    v2 = _sql(spark, cat, "OPTIMIZE t")
    files2 = t._read_manifest(v2).files
    assert len(files2) == 2  # one per partition value
    assert t.read().count() == 150


def test_degenerate_replan_probe_does_not_clamp_replay(spark, tmp_path):
    """Round-12 exactly-once fix: on a checkpoint restart whose last
    logged batch was never executed, Spark first issues a degenerate
    planInputPartitions(X, X) probe where X is that batch's
    (UNDELIVERED) end offset. The probe's start must not raise the
    delivered watermark, or the immediately following real replay
    (prev, X] clamps to empty and the batch's rows are silently lost
    (the long-standing restart-test 'flake' was this data loss)."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.table_source import TxnTableStreamReader
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(600).select(F.col("id").alias("k")).repartition(60)
    )
    reader = TxnTableStreamReader(
        {"path": root, "maxfilespertrigger": "10"}
    )
    # Spark's observed restart sequence for an uncommitted batch
    # (offsets log: ..., off2=(0,30), off3=(0,40); commits: through 2):
    off2 = {"version": 0, "index": 30, "wm": [0, 20]}
    off3 = {"version": 0, "index": 40, "wm": [0, 30]}
    probe = reader.partitions(dict(off3), dict(off3))
    assert probe == []  # degenerate: plans nothing
    replay = reader.partitions(dict(off2), dict(off3))
    files = [f for p in replay for f in p.files]
    assert len(files) == 10  # the replayed slice is delivered in full


def test_stream_partitions_pack_small_files(spark, tmp_path):
    """Round-12 I/O packing (guide §6): a batch of tiny files maps to a
    bounded number of read bundles instead of one task per file, and the
    bundled file set equals the batch's add list in manifest order."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.table_source import TxnTableStreamReader
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(600).select(F.col("id").alias("k")).repartition(60)
    )
    reader = TxnTableStreamReader({"path": root})
    parts = reader.partitions({"version": -1}, {"version": 0})
    assert len(parts) < 60  # tiny files share bundles
    rels = [rel for p in parts for (_, rel) in p.files]
    assert len(rels) == 60 and len(set(rels)) == 60


def test_batch_source_partitions_pack_small_files(spark, tmp_path):
    """Round-12 I/O packing, batch twin (guide §6): the txn_table BATCH
    source bundles tiny files into byte-budget read tasks (it planned
    one task per file), the bundled set equals the snapshot's manifest
    order, DV masks stay per-file, and the read result is unchanged."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.sources.table_batch import (
        TxnTableBatchDataSource,
        TxnTableBatchReader,
        _snapshot_meta,
    )
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(600).select(F.col("id").alias("k")).repartition(60)
    )
    t.delete_where_dv(F.col("k") % 7 == 0)

    reader = TxnTableBatchReader(root, _snapshot_meta(root, 1))
    parts = reader.partitions()
    assert len(parts) < 60  # tiny files share bundles
    rels = [rel for p in parts for (_, rel, _) in p.files]
    assert len(rels) == 60 and len(set(rels)) == 60
    # DV-masked positions ride with their own file only
    assert any(mask for p in parts for (_, _, mask) in p.files)

    spark.dataSource.register(TxnTableBatchDataSource)
    got = (
        spark.read.format("txn_table")
        .load(root)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("s"),
        )
        .collect()[0]
    )
    expect = (
        t.read()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (expect["n"], expect["s"])
