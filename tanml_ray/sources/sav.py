"""Minimal dependency-free SPSS .sav (system file) reader + writer.

Closes the S8 gap (reference utils/data_loader.py:135-142 reads SPSS
via pyreadstat, absent in this environment) with a from-scratch parser
of the PUBLICLY documented system-file layout (PSPP manual, "System
File Format"): "$FL2" header, type-2 variable records (numeric /
string with -1 continuation slots), type-3/4 value labels, type-6
documents, type-7 extension records (skipped by size), type-999
dictionary terminator, then case data either uncompressed or
bytecode-compressed (bias-100 command codes: 0 pad, 1..251 value
code-bias, 252 EOF, 253 literal follows, 254 spaces, 255 sysmis).

Scope: what the reference's loader actually consumes — column names,
numeric doubles (sysmis → null), right-trimmed strings. Value labels,
missing-value ranges and display formats are parsed past, not modeled.
Both endiannesses are handled via the layout_code probe. The writer
emits uncompressed little-endian files and exists so the reader is
testable in an environment with no other .sav producer (round-trip +
hand-built golden bytes in tests/test_sav.py).

Driver-side by design: .sav is the reference's small-upload path (like
S4 Excel), not the 10^12-row flagship path, so the table is parsed
once on the driver and handed to `ray.data.from_arrow`.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

SYSMIS = -1.7976931348623157e308  # lowest finite double = system-missing


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated .sav file")
        self.pos += n
        return b


def _decode(b: bytes) -> str:
    return b.decode("utf-8", errors="replace").rstrip(" \x00")


def read_sav_table(path: str) -> pa.Table:
    """Parse a .sav file into a pyarrow Table (numeric → float64 with
    sysmis as null, strings → utf8 right-trimmed)."""
    with open(path, "rb") as f:
        cur = _Cursor(f.read())

    magic = cur.take(4)
    if magic not in (b"$FL2",):
        raise ValueError(f"not an SPSS system file (magic {magic!r}); "
                         "zsav ($FL3) is out of scope")
    cur.take(60)  # product name
    layout_raw = cur.take(4)
    # layout_code is 2 (sometimes 3); probe it to detect endianness
    end = "<"
    if struct.unpack("<i", layout_raw)[0] not in (2, 3):
        if struct.unpack(">i", layout_raw)[0] in (2, 3):
            end = ">"
        else:
            raise ValueError("cannot determine .sav endianness")
    i4 = end + "i"
    f8 = end + "d"
    nominal_size, compression, _weight, ncases = struct.unpack(
        end + "iiii", cur.take(16))
    bias = struct.unpack(f8, cur.take(8))[0]
    cur.take(9 + 8 + 64 + 3)  # date, time, label, padding

    # --- dictionary records -------------------------------------------------
    names: list[str] = []
    widths: list[int] = []      # 0 numeric, >0 string byte width
    while True:
        rec = struct.unpack(i4, cur.take(4))[0]
        if rec == 2:
            vtype, has_label, n_missing = struct.unpack(
                end + "iii", cur.take(12))
            cur.take(8)  # print + write formats
            name = _decode(cur.take(8))
            if has_label:
                llen = struct.unpack(i4, cur.take(4))[0]
                cur.take((llen + 3) // 4 * 4)
            if n_missing:
                cur.take(8 * abs(n_missing))
            if vtype != -1:  # -1 = continuation slot of a long string
                names.append(name)
                widths.append(max(vtype, 0))
        elif rec in (3,):  # value labels: count, then (value, len, label)*
            n = struct.unpack(i4, cur.take(4))[0]
            for _ in range(n):
                cur.take(8)
                llen = cur.take(1)[0]
                cur.take((llen + 8) // 8 * 8 - 1)
        elif rec == 4:  # label applies-to variable list
            n = struct.unpack(i4, cur.take(4))[0]
            cur.take(4 * n)
        elif rec == 6:  # documents
            n = struct.unpack(i4, cur.take(4))[0]
            cur.take(80 * n)
        elif rec == 7:  # extension: subtype, size, count → skip payload
            _sub, size, count = struct.unpack(end + "iii", cur.take(12))
            cur.take(size * count)
        elif rec == 999:
            cur.take(4)  # filler
            break
        else:
            raise ValueError(f"unknown .sav dictionary record type {rec}")

    # elements (8-byte slots) per case, including long-string spillover
    slots_per_var = [max(1, (w + 7) // 8) for w in widths]
    slots_per_case = sum(slots_per_var)
    if nominal_size not in (-1, slots_per_case):
        # trust the dictionary we actually parsed
        slots_per_case = max(slots_per_case, 1)

    # --- case data ------------------------------------------------------
    def raw_elements():
        """Yield raw 8-byte elements, decompressing bytecode if needed."""
        if compression == 0:
            while cur.pos + 8 <= len(cur.buf):
                yield cur.take(8)
            return
        codes: list[int] = []
        while True:
            if not codes:
                if cur.pos + 8 > len(cur.buf):
                    return
                codes = list(cur.take(8))
            c = codes.pop(0)
            if c == 0:
                continue
            if c == 252:
                return
            if c == 253:
                yield cur.take(8)
            elif c == 254:
                yield b"        "
            elif c == 255:
                yield struct.pack(f8, SYSMIS)
            else:
                yield struct.pack(f8, float(c) - bias)

    cols: list[list] = [[] for _ in names]
    gen = raw_elements()
    n_read = 0
    while ncases < 0 or n_read < ncases:
        try:
            first = next(gen)
        except StopIteration:
            break
        elems = [first]
        try:
            for _ in range(slots_per_case - 1):
                elems.append(next(gen))
        except StopIteration:
            break  # trailing padding, incomplete case
        k = 0
        for j, w in enumerate(widths):
            ns = slots_per_var[j]
            chunk = b"".join(elems[k:k + ns])
            k += ns
            if w == 0:
                v = struct.unpack(f8, chunk)[0]
                cols[j].append(None if v == SYSMIS or np.isnan(v) else v)
            else:
                cols[j].append(_decode(chunk[:w]))
        n_read += 1

    arrays = [pa.array(c, type=pa.float64() if w == 0 else pa.string())
              for c, w in zip(cols, widths)]
    return pa.table(dict(zip(names, arrays)))


def read_sav(path: str):
    import ray.data as rd

    return rd.from_arrow(read_sav_table(path))


def write_sav(path: str, table: pa.Table) -> None:
    """Uncompressed little-endian .sav writer (test fixture producer).

    Numeric columns are written as doubles (null → sysmis); string
    columns as fixed-width right-padded bytes sized to the longest
    value (rounded up to 8, ≤ 255)."""
    names = table.column_names
    widths: list[int] = []
    for name in names:
        col = table.column(name)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            w = max([len(v.encode("utf-8")) for v in col.to_pylist()
                     if v is not None] or [1])
            widths.append(min((w + 7) // 8 * 8, 255))
        else:
            widths.append(0)

    out = bytearray()
    out += b"$FL2"
    out += b"@(#) tanml_ray minimal sav writer".ljust(60)[:60]
    slots = [max(1, (w + 7) // 8) for w in widths]
    out += struct.pack("<iiiii", 2, sum(slots), 0, 0, table.num_rows)
    out += struct.pack("<d", 100.0)
    out += b"01 Jan 70" + b"00:00:00" + b" " * 64 + b"\x00" * 3

    for name, w, ns in zip(names, widths, slots):
        sav_name = name.upper()[:8].ljust(8).encode()
        out += struct.pack("<iiiii", 2, w, 0, 0, 0)
        out += struct.pack("<i", 0)
        out += sav_name
        for _ in range(ns - 1):  # continuation slots for long strings
            out += struct.pack("<iiiii", 2, -1, 0, 0, 0)
            out += struct.pack("<i", 0)
            out += b" " * 8
    out += struct.pack("<ii", 999, 0)

    for i in range(table.num_rows):
        for name, w, ns in zip(names, widths, slots):
            v = table.column(name)[i].as_py()
            if w == 0:
                x = SYSMIS if v is None else float(v)
                out += struct.pack("<d", x)
            else:
                b = ("" if v is None else v).encode("utf-8")[:w]
                out += b.ljust(ns * 8)
    with open(path, "wb") as f:
        f.write(bytes(out))
