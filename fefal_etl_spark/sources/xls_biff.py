"""Dependency-free legacy ``.xls`` (BIFF8 inside CFB) READER (SURVEY.md
§2.1 S2 — the one reference format-family member previously uncovered: the
reference accepts ``.xls`` uploads via pandas, etl_ui.py:861).

Read path ONLY, by design: the engine never emits ``.xls`` (exports are
xlsx/csv/parquet), and a writer would make the tests a closed loop
(SURVEY.md §8's oracle-discipline objection applies to ENCODING, not to
decoding third-party fixture bytes — the unit fixtures are hand-assembled
from the public [MS-CFB]/[MS-XLS] specifications and carry hand-computed
expected values).

Two layers, both stdlib-only (struct + bytes):

1. CFB (Compound File Binary, [MS-CFB]): header → DIFAT → FAT → directory;
   streams smaller than the mini-stream cutoff (4096) are resolved through
   the mini-FAT inside the root entry's mini-stream — real Excel files use
   it for small Workbook streams, so skipping it would reject exactly the
   small survey workbooks this path exists for.
2. BIFF8 record stream ([MS-XLS]): workbook-globals substream (BOUNDSHEET
   sheet directory, SST shared strings incl. CONTINUE splits and both
   compressed/UTF-16 encodings, rich/phonetic payloads skipped) followed by
   per-sheet substreams (RK / MULRK / NUMBER / LABELSST / LABEL / BOOLERR /
   FORMULA with cached result + STRING).

API mirrors sources.xlsx_minimal: ``read_workbook(path_or_bytes)`` →
``{sheet_name: [[cell, ...], ...]}`` with every value a string or None —
the all-strings ingest convention the reference uses (etl_ui.py:863; the
cleaning layer owns typing). Numbers that are integral print without a
trailing ``.0`` (15-significant-digit formatting otherwise), matching how
xlsx stores and xlsx_minimal returns them.

Driver-side single file or distributed via ``binaryFile`` + executor-side
parse — see sources.readers.read_xls / read_excel_dir.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF

# BIFF8 record opcodes
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


# ---------------------------------------------------------------- CFB layer


def _fat_chain(fat: list[int], start: int) -> list[int]:
    """Follow a FAT/mini-FAT chain; cycle-guarded (a corrupt chain must
    raise, not spin)."""
    chain: list[int] = []
    seen: set[int] = set()
    sect = start
    while sect != _ENDOFCHAIN:
        if sect in seen or sect >= len(fat) or sect == _FREESECT:
            raise ValueError(f"corrupt CFB sector chain at sector {sect}")
        seen.add(sect)
        chain.append(sect)
        sect = fat[sect]
    return chain


def cfb_open_stream(data: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """Extract the first directory stream whose name matches ``names``.

    Implements [MS-CFB] v3/v4: DIFAT (header slots + chained DIFAT
    sectors), FAT chains, and the mini-FAT/mini-stream for streams below
    the cutoff.
    """
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not a CFB (.xls) file: bad signature")
    sector_shift = _u16(data, 30)
    mini_shift = _u16(data, 32)
    ssz = 1 << sector_shift
    mssz = 1 << mini_shift
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    n_minifat = _u32(data, 64)
    difat_start = _u32(data, 68)
    n_difat = _u32(data, 72)

    def sector(i: int) -> bytes:
        off = ssz * (i + 1)
        return data[off : off + ssz]

    # DIFAT: 109 header slots, then chained DIFAT sectors (last u32 = next)
    difat: list[int] = list(struct.unpack_from("<109I", data, 76))
    sect = difat_start
    for _ in range(n_difat):
        s = sector(sect)
        difat.extend(struct.unpack_from(f"<{ssz // 4 - 1}I", s, 0))
        sect = _u32(s, ssz - 4)
    fat_sectors = [s for s in difat[:n_fat] if s != _FREESECT]

    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(fs), 0))

    dir_data = b"".join(sector(s) for s in _fat_chain(fat, dir_start))
    entries = []
    for off in range(0, len(dir_data), 128):
        ent = dir_data[off : off + 128]
        if len(ent) < 128:
            break
        name_len = _u16(ent, 64)
        if name_len < 2:
            continue
        name = ent[: name_len - 2].decode("utf-16-le", errors="replace")
        entries.append(
            {
                "name": name,
                "type": ent[66],
                "start": _u32(ent, 116),
                "size": struct.unpack_from("<Q", ent, 120)[0] & 0xFFFFFFFF,
            }
        )
    root = next(e for e in entries if e["type"] == 5)
    target = next(
        (e for e in entries if e["type"] == 2 and e["name"] in names), None
    )
    if target is None:
        raise ValueError(
            f"no {'/'.join(names)} stream in CFB directory "
            f"(found: {[e['name'] for e in entries]})"
        )

    if target["size"] < mini_cutoff:
        # mini-stream: the root entry's FAT chain holds the mini-stream
        # bytes; the mini-FAT (its own FAT chain) maps 64-byte mini-sectors
        mini_stream = b"".join(sector(s) for s in _fat_chain(fat, root["start"]))
        minifat: list[int] = []
        if n_minifat:
            for s in _fat_chain(fat, minifat_start):
                minifat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(s), 0))
        out = b"".join(
            mini_stream[m * mssz : (m + 1) * mssz]
            for m in _fat_chain(minifat, target["start"])
        )
    else:
        out = b"".join(sector(s) for s in _fat_chain(fat, target["start"]))
    return out[: target["size"]]


# --------------------------------------------------------------- BIFF layer


def _decode_rk(rk: int) -> float:
    """RK-packed number ([MS-XLS] 2.5.122): bit0 = ÷100, bit1 = int30,
    else the top 30 bits of an IEEE double."""
    if rk & 0x02:
        v = float(rk >> 2 if rk < 0x80000000 else (rk >> 2) - (1 << 30))
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if rk & 0x01 else v


def _num_str(v: float) -> str:
    """Number → string under the all-strings ingest convention: integral
    values print without '.0' (how xlsx stores them and xlsx_minimal
    returns them); 15 significant digits otherwise (Excel's own display
    precision)."""
    if v != v or v in (float("inf"), float("-inf")):
        # int(inf) raises OverflowError and int(nan) ValueError — surface
        # corrupt payloads as the module's documented error type instead
        raise ValueError(f"non-finite number in cell payload: {v!r}")
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v) if len(repr(v)) <= 17 else format(v, ".15g")


class _Records:
    """BIFF8 record cursor with CONTINUE-aware payload access."""

    def __init__(self, stream: bytes):
        self.s = stream

    def iter_from(self, pos: int):
        s = self.s
        while pos + 4 <= len(s):
            op = _u16(s, pos)
            ln = _u16(s, pos + 2)
            yield pos, op, s[pos + 4 : pos + 4 + ln]
            pos += 4 + ln


def _parse_sst(first_payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared-string table ([MS-XLS] 2.4.265): strings may span CONTINUE
    records; every fragment that starts mid-string re-leads with its own
    compression flag byte, so the encoding can flip between fragments."""
    frags = [first_payload] + continues
    strings: list[str] = []
    n_unique = _u32(frags[0], 4)
    fi, off = 0, 8

    def remaining() -> int:
        return len(frags[fi]) - off

    def advance_fragment():
        nonlocal fi, off
        fi += 1
        off = 0

    while len(strings) < n_unique:
        if remaining() == 0:
            advance_fragment()
        cch = _u16(frags[fi], off)
        off += 2
        grbit = frags[fi][off]
        off += 1
        rich = bool(grbit & 0x08)
        ext = bool(grbit & 0x04)
        c_run = 0
        cb_ext = 0
        if rich:
            c_run = _u16(frags[fi], off)
            off += 2
        if ext:
            cb_ext = _u32(frags[fi], off)
            off += 4
        # character payload, possibly crossing CONTINUE boundaries
        chars: list[str] = []
        need = cch
        wide = bool(grbit & 0x01)
        while need:
            if remaining() == 0:
                advance_fragment()
                wide = bool(frags[fi][off] & 0x01)  # fresh flag byte
                off += 1
            take = min(need, remaining() // (2 if wide else 1))
            if take == 0:
                raise ValueError("corrupt SST: dangling character bytes")
            nbytes = take * (2 if wide else 1)
            raw = frags[fi][off : off + nbytes]
            chars.append(raw.decode("utf-16-le" if wide else "latin-1"))
            off += nbytes
            need -= take
        strings.append("".join(chars))
        # skip rich-text runs and phonetic blocks (4*cRun + cbExt bytes),
        # also CONTINUE-spanning
        skip = 4 * c_run + cb_ext
        while skip:
            if remaining() == 0:
                advance_fragment()
            step = min(skip, remaining())
            off += step
            skip -= step
    return strings


def _short_unistr(b: bytes, off: int) -> tuple[str, int]:
    """ShortXLUnicodeString (u8 length): BOUNDSHEET sheet names."""
    cch = b[off]
    flags = b[off + 1]
    if flags & 0x01:
        return b[off + 2 : off + 2 + 2 * cch].decode("utf-16-le"), off + 2 + 2 * cch
    return b[off + 2 : off + 2 + cch].decode("latin-1"), off + 2 + cch


def _unistr(b: bytes, off: int) -> str:
    """XLUnicodeString / XLUnicodeRichExtendedString (u16 length): LABEL /
    STRING payloads. LABEL actually carries the rich-extended form
    ([MS-XLS] 2.5.293): fRichSt (0x08) prepends a u16 format-run count and
    fExtSt (0x04) a u32 extension size BEFORE the character array — both
    must be skipped or the text decodes shifted. Strings whose character
    array does not fit the record (CONTINUE-split, >~8.2 KB) are rejected
    explicitly rather than silently truncated."""
    cch = _u16(b, off)
    flags = b[off + 2]
    pos = off + 3
    if flags & 0x08:  # fRichSt: cRun format runs follow the text
        pos += 2
    if flags & 0x04:  # fExtSt: cbExtRst phonetic block follows the text
        pos += 4
    nbytes = 2 * cch if flags & 0x01 else cch
    if pos + nbytes > len(b):
        raise ValueError(
            "string cell spans a CONTINUE record (unsupported in the "
            "read-only BIFF8 path)"
        )
    if flags & 0x01:
        return b[pos : pos + nbytes].decode("utf-16-le")
    return b[pos : pos + nbytes].decode("latin-1")


_BOOL_STR = {0: "FALSE", 1: "TRUE"}
_ERR_STR = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A",
}


def read_workbook(path: "str | bytes | bytearray | memoryview") -> dict[str, list[list]]:
    """All sheets of a BIFF8 ``.xls`` workbook as row-major grids of
    str | None — same contract as xlsx_minimal.read_workbook, so both
    Excel generations share one ingest path downstream."""
    if isinstance(path, (bytes, bytearray, memoryview)):
        data = bytes(path)
    else:
        with open(path, "rb") as f:
            data = f.read()
    wb = cfb_open_stream(data)
    recs = _Records(wb)

    # --- workbook globals: sheet directory + SST
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    it = recs.iter_from(0)
    pos0, op, payload = next(it)
    if op != _BOF:
        raise ValueError("workbook stream does not start with BOF")
    vers = _u16(payload, 0)
    if vers != 0x0600:
        # BIFF5/95 'Book' streams share the BOF opcode but use different
        # string layouts (no Unicode flags byte) — decoding them as BIFF8
        # would return silently garbled text, so reject explicitly.
        raise ValueError(
            f"unsupported BIFF version 0x{vers:04x}: only BIFF8 "
            "(Excel 97+) .xls files are supported"
        )
    pending_sst: bytes | None = None
    sst_continues: list[bytes] = []
    for pos, op, payload in it:
        if op == _SST:
            pending_sst = payload
            sst_continues = []
        elif op == _CONTINUE and pending_sst is not None:
            sst_continues.append(payload)
        elif pending_sst is not None and op not in (_SST, _CONTINUE):
            sst = _parse_sst(pending_sst, sst_continues)
            pending_sst = None
        if op == _BOUNDSHEET:
            lb_ply_pos = _u32(payload, 0)
            dt = payload[5]
            name, _ = _short_unistr(payload, 6)
            if dt == 0x00:  # worksheet (skip charts/macros)
                sheets.append((name, lb_ply_pos))
        elif op == _EOF:
            break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, sst_continues)

    # --- per-sheet substreams
    out: dict[str, list[list]] = {}
    for name, start in sheets:
        cells: dict[tuple[int, int], "str | None"] = {}
        it = recs.iter_from(start)
        pos, op, payload = next(it)
        if op != _BOF:
            raise ValueError(f"sheet {name!r}: substream does not start with BOF")
        pending_formula_cell: tuple[int, int] | None = None
        for pos, op, payload in it:
            if op == _EOF:
                break
            if op == _RK:
                r, c = _u16(payload, 0), _u16(payload, 2)
                cells[(r, c)] = _num_str(_decode_rk(_u32(payload, 6)))
            elif op == _MULRK:
                r, c0 = _u16(payload, 0), _u16(payload, 2)
                n = (len(payload) - 6) // 6
                for i in range(n):
                    rk = _u32(payload, 4 + 6 * i + 2)
                    cells[(r, c0 + i)] = _num_str(_decode_rk(rk))
            elif op == _NUMBER:
                r, c = _u16(payload, 0), _u16(payload, 2)
                cells[(r, c)] = _num_str(struct.unpack_from("<d", payload, 6)[0])
            elif op == _LABELSST:
                r, c = _u16(payload, 0), _u16(payload, 2)
                cells[(r, c)] = sst[_u32(payload, 6)]
            elif op == _LABEL:
                r, c = _u16(payload, 0), _u16(payload, 2)
                cells[(r, c)] = _unistr(payload, 6)
            elif op == _BOOLERR:
                r, c = _u16(payload, 0), _u16(payload, 2)
                val, is_err = payload[6], payload[7]
                cells[(r, c)] = (
                    _ERR_STR.get(val, f"#ERR{val:02X}")
                    if is_err
                    else _BOOL_STR[val]
                )
            elif op == _FORMULA:
                r, c = _u16(payload, 0), _u16(payload, 2)
                res = payload[6:14]
                if res[6:8] == b"\xff\xff":
                    kind = res[0]
                    if kind == 0:  # string result follows in a STRING record
                        pending_formula_cell = (r, c)
                    elif kind == 1:
                        cells[(r, c)] = _BOOL_STR[res[2]]
                    elif kind == 2:
                        cells[(r, c)] = _ERR_STR.get(res[2], f"#ERR{res[2]:02X}")
                    else:  # kind == 3: empty string
                        cells[(r, c)] = ""
                else:
                    cells[(r, c)] = _num_str(struct.unpack("<d", res)[0])
            elif op == _STRING and pending_formula_cell is not None:
                cells[pending_formula_cell] = _unistr(payload, 0)
                pending_formula_cell = None
        if cells:
            max_r = max(r for r, _ in cells)
            max_c = max(c for _, c in cells)
            grid = [
                [cells.get((r, c)) for c in range(max_c + 1)]
                for r in range(max_r + 1)
            ]
        else:
            grid = []
        out[name] = grid
    return out
