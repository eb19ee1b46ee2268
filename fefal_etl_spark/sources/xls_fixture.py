"""Hand-assembled BIFF8/CFB fixture workbooks for validating the ``.xls``
READ path (sources.xls_biff).

These are NOT writers: each function emits one FIXED workbook whose bytes
are assembled record-by-record from the public [MS-CFB] and [MS-XLS]
specifications, with the cell contents fully determined by literals below.
The engine's export formats remain xlsx/csv/parquet; keeping the .xls side
read-only avoids the closed-loop-roundtrip problem (SURVEY.md §8) — the
unit tests assert the DECODED grids against hand-computed expected values,
and the ``xls_scan`` registry query checks the decoded nation grid against
the REAL nation parquet through the DuckDB oracle, an independent data
source neither these bytes nor the parser can influence.

Reference behavior covered: etl_ui.py:861 accepts ``.xls`` uploads through
``pd.read_excel``.
"""

from __future__ import annotations

import struct

_EOC = 0xFFFFFFFE
_FREE = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


# ------------------------------------------------------------ BIFF records


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    # vers=0x0600 (BIFF8), dt, rupBuild/rupYear arbitrary, history flags 0
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _eof() -> bytes:
    return _rec(0x000A, b"")


def _boundsheet(pos: int, name: str) -> bytes:
    # [u32 lbPlyPos][u8 hidden=0][u8 dt=0 worksheet][ShortXLUnicodeString]
    return _rec(
        0x0085,
        struct.pack("<IBB", pos, 0, 0)
        + bytes([len(name), 0])
        + name.encode("latin-1"),
    )


def _labelsst(r: int, c: int, isst: int) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def _number(r: int, c: int, v: float) -> bytes:
    return _rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v))


def _rk_int(v: int, x100: bool = False) -> int:
    # fInt=1 RK: signed 30-bit payload in the top 30 bits
    return ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if x100 else 0x00)


def _rk_ieee(v: float, x100: bool = False) -> int:
    # fInt=0 RK: top 30 bits of the IEEE double (value must survive the
    # 34-bit mantissa truncation exactly — callers pick such values)
    (bits,) = struct.unpack("<Q", struct.pack("<d", v))
    return ((bits >> 32) & 0xFFFFFFFC) | (0x01 if x100 else 0x00)


def _rk(r: int, c: int, rk: int) -> bytes:
    return _rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))


def _mulrk(r: int, c0: int, rks: list[int]) -> bytes:
    body = b"".join(struct.pack("<HI", 0, k) for k in rks)
    return _rec(
        0x00BD,
        struct.pack("<HH", r, c0) + body + struct.pack("<H", c0 + len(rks) - 1),
    )


def _boolerr(r: int, c: int, val: int, is_err: bool) -> bytes:
    return _rec(0x0205, struct.pack("<HHHBB", r, c, 0, val, 1 if is_err else 0))


def _label(r: int, c: int, s: str) -> bytes:
    return _rec(
        0x0204,
        struct.pack("<HHH", r, c, 0)
        + struct.pack("<HB", len(s), 0)
        + s.encode("latin-1"),
    )


def _formula_num(r: int, c: int, v: float) -> bytes:
    # cached numeric result; grbit=0, chn=0, empty parsed expression
    return _rec(
        0x0006,
        struct.pack("<HHH", r, c, 0)
        + struct.pack("<d", v)
        + struct.pack("<HIH", 0, 0, 0),
    )


def _formula_str(r: int, c: int, s: str) -> bytes:
    # cached string result: result field = [0x00, 0, ..., 0xFF 0xFF], the
    # text arrives in the STRING record that follows
    res = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    return _rec(
        0x0006,
        struct.pack("<HHH", r, c, 0) + res + struct.pack("<HIH", 0, 0, 0),
    ) + _rec(0x0207, struct.pack("<HB", len(s), 0) + s.encode("latin-1"))


def _sst(total: int, strings: list[tuple[str, bool]]) -> bytes:
    """SST in one record; (text, wide) pairs."""
    body = struct.pack("<II", total, len(strings))
    for s, wide in strings:
        body += struct.pack("<HB", len(s), 1 if wide else 0)
        body += s.encode("utf-16-le" if wide else "latin-1")
    return _rec(0x00FC, body)


# ---------------------------------------------------------------- CFB shell


def _dir_entry(name: str, typ: int, start: int, size: int, child: int = _FREE) -> bytes:
    raw = name.encode("utf-16-le")
    return (
        raw
        + b"\x00" * (64 - len(raw))
        + struct.pack("<H", len(raw) + 2)
        + bytes([typ, 1])  # type, black
        + struct.pack("<III", _FREE, _FREE, child)  # left, right, child
        + b"\x00" * 16  # CLSID
        + struct.pack("<I", 0)  # state bits
        + b"\x00" * 16  # timestamps
        + struct.pack("<IQ", start, size)
    )


def _cfb_header(
    n_fat: int, dir_start: int, minifat_start: int, n_minifat: int
) -> bytes:
    h = (
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"  # signature
        + b"\x00" * 16  # CLSID
        + struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3: 512B)
        + struct.pack("<H", 0xFFFE)  # little-endian marker
        + struct.pack("<HH", 9, 6)  # sector shift, mini shift
        + b"\x00" * 6  # reserved
        + struct.pack("<I", 0)  # directory sector count (v3: 0)
        + struct.pack("<I", n_fat)
        + struct.pack("<I", dir_start)
        + struct.pack("<I", 0)  # transaction signature
        + struct.pack("<I", 4096)  # mini-stream cutoff
        + struct.pack("<I", minifat_start)
        + struct.pack("<I", n_minifat)
        + struct.pack("<I", _EOC)  # first DIFAT sector: none
        + struct.pack("<I", 0)  # DIFAT sector count
    )
    difat = struct.pack("<I", 0) + struct.pack("<I", _FREE) * 108  # FAT @ sector 0
    return h + difat


def _pack_fat(entries: list[int]) -> bytes:
    entries = entries + [_FREE] * (128 - len(entries))
    return struct.pack("<128I", *entries)


def cfb_wrap_fat(stream: bytes) -> bytes:
    """Wrap a BIFF stream ≥ 4096 bytes as a CFB whose Workbook lives in
    regular FAT sectors (pads the stream up to the cutoff if shorter)."""
    if len(stream) < 4096:
        stream = stream + b"\x00" * (4096 - len(stream))
    n_wb = (len(stream) + 511) // 512
    stream = stream + b"\x00" * (n_wb * 512 - len(stream))
    assert 2 + n_wb <= 128, "fixture exceeds one FAT sector"
    # sectors: 0=FAT, 1=directory, 2..: workbook
    fat = [_FATSECT, _EOC] + [2 + i + 1 for i in range(n_wb - 1)] + [_EOC]
    directory = (
        _dir_entry("Root Entry", 5, _EOC, 0, child=1)
        + _dir_entry("Workbook", 2, 2, len(stream))
        + b"\x00" * 256
    )
    return (
        _cfb_header(n_fat=1, dir_start=1, minifat_start=_EOC, n_minifat=0)
        + _pack_fat(fat)
        + directory
        + stream
    )


def cfb_wrap_mini(stream: bytes) -> bytes:
    """Wrap a BIFF stream < 4096 bytes as a CFB whose Workbook lives in the
    root entry's MINI-stream, addressed through the mini-FAT — the layout
    real Excel emits for small workbooks."""
    assert len(stream) < 4096
    n_mini = (len(stream) + 63) // 64
    ministream = stream + b"\x00" * (n_mini * 64 - len(stream))
    n_ms_sect = (len(ministream) + 511) // 512
    ministream = ministream + b"\x00" * (n_ms_sect * 512 - len(ministream))
    # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..: mini-stream
    fat = [_FATSECT, _EOC, _EOC]
    fat += [3 + i + 1 for i in range(n_ms_sect - 1)] + [_EOC]
    minifat = [i + 1 for i in range(n_mini - 1)] + [_EOC]
    directory = (
        _dir_entry("Root Entry", 5, 3, n_ms_sect * 512, child=1)
        + _dir_entry("Workbook", 2, 0, len(stream))
        + b"\x00" * 256
    )
    return (
        _cfb_header(n_fat=1, dir_start=1, minifat_start=2, n_minifat=1)
        + _pack_fat(fat)
        + directory
        + struct.pack(f"<{128}I", *(minifat + [_FREE] * (128 - len(minifat))))
        + ministream
    )


# ------------------------------------------------------------- the fixtures


def nation_xls_bytes() -> bytes:
    """One-sheet workbook holding the 25 fixed nation rows of the test
    corpus (keys and ``NATION_i`` names are constants of the data
    generator, identical at every SF) — header row + 25 data rows across
    a deliberate mix of cell encodings:

    * ``n_nationkey``: RK fInt for even keys, NUMBER doubles for odd keys
    * ``n_name``: shared strings (LABELSST), one per distinct name
    * ``n_regionkey``: MULRK runs would span rows, so: RK fInt

    The ``xls_scan`` registry query reads this workbook with the BIFF
    parser and the DuckDB oracle replays ``SELECT ... FROM nation`` over
    the real parquet — if the decoder mangles any record type the hashes
    diverge.
    """
    header = ["n_nationkey", "n_name", "n_regionkey"]
    sst_strings = header + [f"NATION_{i}" for i in range(25)]
    sheet = _bof(0x0010)
    for c in range(3):
        sheet += _labelsst(0, c, c)
    for i in range(25):
        r = i + 1
        if i % 2 == 0:
            sheet += _rk(r, 0, _rk_int(i))
        else:
            sheet += _number(r, 0, float(i))
        sheet += _labelsst(r, 1, 3 + i)
        sheet += _rk(r, 2, _rk_int(i % 5))
    sheet += _eof()

    globals_head = _bof(0x0005)
    sst = _sst(total=3 + 25, strings=[(s, False) for s in sst_strings])
    # lbPlyPos = offset of the sheet BOF = globals length, which includes
    # the boundsheet record itself — its length is fixed (name "nation")
    bs_len = len(_boundsheet(0, "nation"))
    globals_len = len(globals_head) + len(sst) + bs_len + len(_eof())
    wb = (
        globals_head
        + _boundsheet(globals_len, "nation")
        + sst
        + _eof()
        + sheet
    )
    return cfb_wrap_fat(wb)


def kitchen_sink_xls_bytes() -> bytes:
    """Small two-sheet workbook exercising every supported record type and
    both CFB storage paths the nation fixture doesn't: mini-FAT storage,
    a CONTINUE-split SST whose second fragment flips to UTF-16, RK ×100
    variants, MULRK, BOOLERR (bool + error), LABEL, and FORMULA caches
    (numeric + string). Expected grids are asserted literally in
    tests/test_xls_biff.py."""
    # SST: "alpha" compressed; "grüßé" wide; third string split across a
    # CONTINUE whose continuation flips to wide encoding
    first_part, second_part = "north-", "søuth"
    sst_body = struct.pack("<II", 4, 3)
    sst_body += struct.pack("<HB", 5, 0) + b"alpha"
    sst_body += struct.pack("<HB", 5, 1) + "grüßé".encode("utf-16-le")
    sst_body += struct.pack("<HB", len(first_part) + len(second_part), 0)
    sst_body += first_part.encode("latin-1")
    sst = _rec(0x00FC, sst_body)
    cont = _rec(
        0x003C, bytes([1]) + second_part.encode("utf-16-le")
    )  # fresh flag byte: now wide

    sheet1 = _bof(0x0010)
    sheet1 += _labelsst(0, 0, 0)  # alpha
    sheet1 += _labelsst(0, 1, 1)  # grüßé
    sheet1 += _labelsst(0, 2, 2)  # north-søuth
    sheet1 += _rk(1, 0, _rk_int(1234))  # 1234
    sheet1 += _rk(1, 1, _rk_int(-7))  # -7 (sign-extended int30)
    sheet1 += _rk(1, 2, _rk_int(12345, x100=True))  # 123.45
    sheet1 += _rk(2, 0, _rk_ieee(2.5))  # 2.5 (IEEE top-30)
    sheet1 += _rk(2, 1, _rk_ieee(360.0, x100=True))  # 3.6
    sheet1 += _mulrk(3, 1, [_rk_int(7), _rk_int(8), _rk_int(9)])  # B4:D4
    sheet1 += _number(4, 0, 3.25)
    sheet1 += _boolerr(4, 1, 1, is_err=False)  # TRUE
    sheet1 += _boolerr(4, 2, 0x07, is_err=True)  # #DIV/0!
    sheet1 += _label(5, 0, "inline")
    sheet1 += _formula_num(5, 1, 6.5)
    sheet1 += _formula_str(5, 2, "calc")
    sheet1 += _eof()

    sheet2 = _bof(0x0010) + _label(0, 0, "second") + _eof()

    globals_head = _bof(0x0005)
    bs1 = _boundsheet(0, "data")
    bs2 = _boundsheet(0, "meta")
    globals_len = len(globals_head) + len(bs1) + len(bs2) + len(sst) + len(cont) + len(_eof())
    wb = (
        globals_head
        + _boundsheet(globals_len, "data")
        + _boundsheet(globals_len + len(sheet1), "meta")
        + sst
        + cont
        + _eof()
        + sheet1
        + sheet2
    )
    return cfb_wrap_mini(wb)
