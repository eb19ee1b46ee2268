"""BIFF8 .xls reader validation (SURVEY.md §2.1 S2 — reference parity for
etl_ui.py:861's pd.read_excel('.xls') ingest).

The fixtures are hand-assembled from the public [MS-CFB]/[MS-XLS] specs
(sources/xls_fixture.py) and the EXPECTED grids below are hand-computed
literals — decoding third-party-format bytes against independent expected
values, not an encode→decode roundtrip (the SURVEY §8 oracle-discipline
objection applies to encoding)."""

import pytest

from fefal_etl_spark.sources.xls_biff import read_workbook
from fefal_etl_spark.sources.xls_fixture import (
    kitchen_sink_xls_bytes,
    nation_xls_bytes,
)


def test_nation_fixture_decodes_to_nation_rows():
    book = read_workbook(nation_xls_bytes())
    assert list(book) == ["nation"]
    grid = book["nation"]
    assert grid[0] == ["n_nationkey", "n_name", "n_regionkey"]
    assert len(grid) == 26
    for i in range(25):
        assert grid[i + 1] == [str(i), f"NATION_{i}", str(i % 5)]


def test_kitchen_sink_records_and_ministream():
    book = read_workbook(kitchen_sink_xls_bytes())
    assert list(book) == ["data", "meta"]
    grid = book["data"]
    # row 0: SST — compressed, UTF-16, and CONTINUE-split (flips to wide)
    assert grid[0] == ["alpha", "grüßé", "north-søuth", None]
    # row 1: RK int30, negative int30 (sign extension), ×100 int
    assert grid[1] == ["1234", "-7", "123.45", None]
    # row 2: RK IEEE-top-30, IEEE ×100
    assert grid[2] == ["2.5", "3.6", None, None]
    # row 3: MULRK starting at column B
    assert grid[3] == [None, "7", "8", "9"]
    # row 4: NUMBER, BOOLERR bool, BOOLERR error
    assert grid[4] == ["3.25", "TRUE", "#DIV/0!", None]
    # row 5: LABEL, FORMULA numeric cache, FORMULA string cache (STRING rec)
    assert grid[5] == ["inline", "6.5", "calc", None]
    assert book["meta"] == [["second"]]


def test_rejects_non_cfb_bytes():
    with pytest.raises(ValueError, match="bad signature"):
        read_workbook(b"PK\x03\x04 this is a zip, not a CFB" + b"\x00" * 600)


def test_read_xls_spark(spark, tmp_path):
    p = str(tmp_path / "nation.xls")
    with open(p, "wb") as f:
        f.write(nation_xls_bytes())
    from fefal_etl_spark.sources.readers import read_xls

    df = read_xls(spark, p)
    assert df.columns == ["n_nationkey", "n_name", "n_regionkey"]
    rows = {r["n_nationkey"]: r for r in df.collect()}
    assert len(rows) == 25
    assert rows["24"]["n_name"] == "NATION_24"
    assert rows["24"]["n_regionkey"] == "4"
