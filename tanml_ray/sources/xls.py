"""S4 (legacy tier): minimal from-scratch BIFF8 ``.xls`` reader —
xlrd is absent in this environment, and the reference reads both
modern and legacy Excel through pd.read_excel
(/root/reference/tanml/utils/data_loader.py:103-110). Built on the two
public specs the format is made of:

  * MS-CFB  — the OLE2 compound-file container (FAT sector chains,
    directory entries, mini-stream for streams under the 4096-byte
    cutoff),
  * MS-XLS  — the BIFF8 record stream inside the ``Workbook`` entry
    (SST shared strings, BOUNDSHEET sheet offsets, and the
    LABELSST / NUMBER / RK / MULRK / LABEL / BOOLERR cell records).

Row 1 is the header, matching read_xlsx_table / the reference's
pd.read_excel(sheet_name=0) default. Driver-side by design:
spreadsheets are config/metadata-scale inputs, never the 10^12-row
path. Unsupported corners (BIFF5, CONTINUE-split SST, formulas) raise
a named error instead of mis-reading.
"""

from __future__ import annotations

import struct

import pyarrow as pa

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


def _cfb_open_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Return the bytes of the first directory entry whose name is in
    `names`, following the FAT chain (or the miniFAT chain for streams
    below the mini cutoff)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic); "
                         "legacy .xls must be a CFB container")
    sector = 1 << _u16(data, 30)
    minisec = 1 << _u16(data, 32)
    n_difat = _u32(data, 72)
    dir_start = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    difat = [_u32(data, 76 + 4 * i) for i in range(109)]
    s = _u32(data, 68)
    for _ in range(n_difat):
        off = 512 + s * sector
        difat += [_u32(data, off + 4 * i) for i in range(sector // 4 - 1)]
        s = _u32(data, off + sector - 4)

    fat: list[int] = []
    for fs in difat:
        if fs in (_FREESECT, _ENDOFCHAIN):
            continue
        off = 512 + fs * sector
        fat += [_u32(data, off + 4 * i) for i in range(sector // 4)]

    def chain(start: int, table: list[int]) -> list[int]:
        out, s = [], start
        while s not in (_ENDOFCHAIN, _FREESECT) and s < len(table):
            out.append(s)
            s = table[s]
            if len(out) > len(table):
                raise ValueError("cyclic FAT chain in .xls container")
        return out

    def read_fat_chain(start: int) -> bytes:
        return b"".join(data[512 + s * sector:512 + (s + 1) * sector]
                        for s in chain(start, fat))

    dirdata = read_fat_chain(dir_start)
    entries = []
    for i in range(0, len(dirdata), 128):
        e = dirdata[i:i + 128]
        if len(e) < 128:
            break
        nlen = _u16(e, 64)
        name = e[:max(nlen - 2, 0)].decode("utf-16-le", "ignore")
        entries.append({"name": name, "type": e[66],
                        "start": _u32(e, 116), "size": _u32(e, 120)})
    if not entries:
        raise ValueError("empty CFB directory in .xls container")

    target = next((e for e in entries if e["name"] in names), None)
    if target is None:
        raise ValueError(
            f"no {'/'.join(names)} stream in .xls container; entries: "
            f"{[e['name'] for e in entries if e['name']]}")
    if target["size"] >= mini_cutoff or target is entries[0]:
        return read_fat_chain(target["start"])[:target["size"]]
    # small stream: bytes live in the root entry's mini stream,
    # chained through the miniFAT
    mini_stream = read_fat_chain(entries[0]["start"])
    minifat_raw = read_fat_chain(minifat_start)
    minifat = [_u32(minifat_raw, 4 * i) for i in range(len(minifat_raw) // 4)]
    out = b"".join(
        mini_stream[s * minisec:(s + 1) * minisec]
        for s in chain(target["start"], minifat))
    return out[:target["size"]]


def _decode_biff8_string(pay: bytes, off: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString: (text, next offset)."""
    cch = _u16(pay, off)
    flags = pay[off + 2]
    off += 3
    n_rt = 0
    cb_ext = 0
    if flags & 0x08:                         # rich-text runs follow
        n_rt = _u16(pay, off)
        off += 2
    if flags & 0x04:                         # phonetic block follows
        cb_ext = _u32(pay, off)
        off += 4
    if flags & 0x01:
        raw = pay[off:off + 2 * cch]
        if len(raw) < 2 * cch:
            raise ValueError("CONTINUE-split SST string not supported "
                             "by the minimal BIFF8 reader")
        text = raw.decode("utf-16-le")
        off += 2 * cch
    else:
        raw = pay[off:off + cch]
        if len(raw) < cch:
            raise ValueError("CONTINUE-split SST string not supported "
                             "by the minimal BIFF8 reader")
        text = raw.decode("latin-1")
        off += cch
    off += 4 * n_rt + cb_ext
    return text, off


def _decode_rk(rk: int) -> float:
    if rk & 0x02:                            # 30-bit signed integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:                                    # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


def read_xls_table(path: str, sheet_index: int = 0) -> pa.Table:
    """Parse sheet `sheet_index` of a BIFF8 .xls into an Arrow table;
    row 1 is the header."""
    with open(path, "rb") as f:
        data = f.read()
    wb = _cfb_open_stream(data, ("Workbook", "Book"))
    if len(wb) < 8:
        raise ValueError("truncated Workbook stream in .xls")
    if _u16(wb, 0) == 0x0809 and _u16(wb, 4) not in (0x0600,):
        raise ValueError(
            f"BIFF version 0x{_u16(wb, 4):04x} not supported — the "
            "minimal reader handles BIFF8 (Excel 97-2003) only")

    sst: list[str] = []
    sheet_offsets: list[int] = []
    pos = 0
    while pos + 4 <= len(wb):
        op, ln = _u16(wb, pos), _u16(wb, pos + 2)
        pay = wb[pos + 4:pos + 4 + ln]
        if op == 0x0085:                      # BOUNDSHEET
            sheet_offsets.append(_u32(pay, 0))
        elif op == 0x00FC:                    # SST
            n_unique = _u32(pay, 4)
            off = 8
            for _ in range(n_unique):
                text, off = _decode_biff8_string(pay, off)
                sst.append(text)
        elif op == 0x003C and sst:            # CONTINUE after SST
            raise ValueError("CONTINUE-split SST not supported by the "
                             "minimal BIFF8 reader")
        elif op == 0x000A and sheet_offsets:  # EOF of the globals part
            pos += 4 + ln
            break
        pos += 4 + ln

    if not sheet_offsets:
        raise ValueError("no BOUNDSHEET records in .xls workbook globals")
    if not 0 <= sheet_index < len(sheet_offsets):
        raise IndexError(f"sheet_index {sheet_index} out of range "
                         f"({len(sheet_offsets)} sheets)")

    cells: dict[tuple[int, int], object] = {}
    pos = sheet_offsets[sheet_index]
    while pos + 4 <= len(wb):
        op, ln = _u16(wb, pos), _u16(wb, pos + 2)
        pay = wb[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if op == 0x000A:                      # EOF of the sheet substream
            break
        if op == 0x00FD:                      # LABELSST
            cells[(_u16(pay, 0), _u16(pay, 2))] = sst[_u32(pay, 6)]
        elif op == 0x0203:                    # NUMBER
            cells[(_u16(pay, 0), _u16(pay, 2))] = \
                struct.unpack_from("<d", pay, 6)[0]
        elif op == 0x027E:                    # RK
            cells[(_u16(pay, 0), _u16(pay, 2))] = _decode_rk(_u32(pay, 6))
        elif op == 0x00BD:                    # MULRK
            rw, col0 = _u16(pay, 0), _u16(pay, 2)
            n = (ln - 6) // 6
            for i in range(n):
                cells[(rw, col0 + i)] = _decode_rk(_u32(pay, 4 + 6 * i + 2))
        elif op == 0x0204:                    # LABEL (inline string)
            text, _ = _decode_biff8_string(pay, 6)
            cells[(_u16(pay, 0), _u16(pay, 2))] = text
        elif op == 0x0205:                    # BOOLERR
            if pay[7] == 0:                   # fError == 0 → boolean
                cells[(_u16(pay, 0), _u16(pay, 2))] = bool(pay[6])
        elif op == 0x0006:
            raise ValueError("FORMULA cells not supported by the "
                             "minimal BIFF8 reader")
        # ROW / BLANK / MULBLANK / DIMENSION / format records: no value

    if not cells:
        return pa.table({})
    rows = sorted({r for r, _ in cells})
    header_row = rows[0]
    ncol = max(c for _, c in cells) + 1
    names = [str(cells.get((header_row, i), f"col{i}")) for i in range(ncol)]
    cols: list[list] = [[] for _ in range(ncol)]
    for r in rows[1:]:
        for i in range(ncol):
            cols[i].append(cells.get((r, i)))
    import pandas as pd

    from tanml_ray.functions.collect import from_pandas_clean

    return from_pandas_clean(pd.DataFrame(dict(zip(names, cols))))


def read_xls(path: str, sheet_index: int = 0):
    import ray.data as rd

    return rd.from_arrow(read_xls_table(path, sheet_index))
