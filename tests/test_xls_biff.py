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


def test_rejects_biff5_version():
    """A BIFF5/95 workbook (vers 0x0500 in BOF) must be rejected outright:
    its string records have no Unicode-flags byte, so decoding it with
    BIFF8 layouts would return silently garbled text."""
    data = nation_xls_bytes()
    # the workbook stream begins with BOF: op(2) len(2) vers(2) — patch the
    # version word inside the CFB sector payload
    import struct as _s

    bof_sig = _s.pack("<HH", 0x0809, 16) + _s.pack("<H", 0x0600)
    idx = data.find(bof_sig)
    assert idx > 0
    patched = (
        data[: idx + 4] + _s.pack("<H", 0x0500) + data[idx + 6 :]
    )
    with pytest.raises(ValueError, match="BIFF8"):
        read_workbook(patched)


def test_unistr_rich_and_ext_flags():
    """LABEL payloads carrying the rich (0x08) / ext (0x04) flags must skip
    the cRun / cbExtRst fields before the character array."""
    import struct as _s

    from fefal_etl_spark.sources.xls_biff import _unistr

    text = "Hello"
    # rich compressed: cch, flags=0x08, cRun=2, chars, runs(4 bytes each)
    b = _s.pack("<HBH", len(text), 0x08, 2) + text.encode("latin-1") + b"\x00" * 8
    assert _unistr(b, 0) == text
    # ext utf-16: cch, flags=0x05, cbExtRst=4, chars, ext block
    b = (
        _s.pack("<HBI", len(text), 0x05, 4)
        + text.encode("utf-16-le")
        + b"\x00" * 4
    )
    assert _unistr(b, 0) == text
    # truncated char array (CONTINUE-split) must raise, not silently clip
    b = _s.pack("<HB", 10, 0x00) + b"abc"
    with pytest.raises(ValueError, match="CONTINUE"):
        _unistr(b, 0)


def test_num_str_rejects_non_finite():
    from fefal_etl_spark.sources.xls_biff import _num_str

    with pytest.raises(ValueError, match="non-finite"):
        _num_str(float("inf"))
    with pytest.raises(ValueError, match="non-finite"):
        _num_str(float("nan"))
    assert _num_str(3.0) == "3"
