"""sources/xls: minimal BIFF8 .xls reader over hand-built MS-CFB /
MS-XLS fixtures (xlrd is absent; the fixture builder follows the two
public specs independently of the reader's parse path — FAT vs
mini-stream container layouts, SST/LABELSST, NUMBER, RK, MULRK,
BOOLERR, multi-sheet BOUNDSHEET, and the named-error corners)."""

from __future__ import annotations

import struct

import pytest

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _sst_string(s: str) -> bytes:
    raw = s.encode("latin-1", "strict") if s.isascii() else None
    if raw is not None:
        return struct.pack("<HB", len(s), 0x00) + raw
    return struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")


def _rk_from_int(v: int) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 0x02


def _workbook_stream(sheets: list[dict], biff_ver: int = 0x0600) -> bytes:
    """BIFF8 Workbook stream: globals (BOF, BOUNDSHEETs, SST, EOF) +
    one substream per sheet. `sheets` entries: {"name": str, "cells":
    list of record bytes factories taking the SST index map}."""
    strings: list[str] = []
    for sh in sheets:
        for kind, *args in sh["cells"]:
            if kind == "label":
                if args[2] not in strings:
                    strings.append(args[2])

    def sst_index(s: str) -> int:
        return strings.index(s)

    substreams = []
    for sh in sheets:
        body = [_rec(0x0809, struct.pack("<HHHH", biff_ver, 0x0010, 0, 0))]
        for kind, *args in sh["cells"]:
            rw, col = args[0], args[1]
            if kind == "label":
                body.append(_rec(0x00FD, struct.pack(
                    "<HHHI", rw, col, 0, sst_index(args[2]))))
            elif kind == "number":
                body.append(_rec(0x0203, struct.pack(
                    "<HHH", rw, col, 0) + struct.pack("<d", args[2])))
            elif kind == "rk_int":
                body.append(_rec(0x027E, struct.pack(
                    "<HHHI", rw, col, 0, _rk_from_int(args[2]))))
            elif kind == "mulrk":
                vals = args[2]
                pay = struct.pack("<HH", rw, col)
                for v in vals:
                    pay += struct.pack("<HI", 0, _rk_from_int(v))
                pay += struct.pack("<H", col + len(vals) - 1)
                body.append(_rec(0x00BD, pay))
            elif kind == "bool":
                body.append(_rec(0x0205, struct.pack(
                    "<HHHBB", rw, col, 0, int(args[2]), 0)))
            elif kind == "formula":
                body.append(_rec(0x0006, struct.pack("<HHH", rw, col, 0)
                                 + b"\x00" * 14))
        body.append(_rec(0x000A, b""))
        substreams.append(b"".join(body))

    globals_head = [_rec(0x0809, struct.pack("<HHHH", biff_ver, 0x0005, 0, 0))]
    # BOUNDSHEET offsets depend on the globals length → assemble with a
    # placeholder pass first
    def build_globals(offsets: list[int]) -> bytes:
        recs = list(globals_head)
        for sh, off in zip(sheets, offsets):
            name = sh["name"].encode("latin-1")
            recs.append(_rec(0x0085, struct.pack("<IHB", off, 0, len(name))
                             + b"\x00" + name))
        if strings:
            pay = struct.pack("<II", len(strings), len(strings))
            pay += b"".join(_sst_string(s) for s in strings)
            recs.append(_rec(0x00FC, pay))
        recs.append(_rec(0x000A, b""))
        return b"".join(recs)

    glen = len(build_globals([0] * len(sheets)))
    offsets = []
    run = glen
    for ss in substreams:
        offsets.append(run)
        run += len(ss)
    return build_globals(offsets) + b"".join(substreams)


def _cfb_container(stream: bytes, force_mini: bool | None = None) -> bytes:
    """Wrap `stream` as the Workbook entry of a CFB file. Streams under
    4096 bytes go through the mini-stream + miniFAT (the spec cutoff);
    force_mini=False pads the stream into the regular FAT instead."""
    sector, minisec = 512, 64
    use_mini = len(stream) < 4096 if force_mini is None else force_mini
    if not use_mini and len(stream) < 4096:
        stream = stream + b"\x00" * (4096 - len(stream))

    def dirent(name: str, etype: int, start: int, size: int,
               child: int = FREESECT) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1                                    # black
        struct.pack_into("<III", e, 68, FREESECT, FREESECT, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    if use_mini:
        ms = stream + b"\x00" * (-len(stream) % minisec)
        n_mini = len(ms) // minisec
        ms += b"\x00" * (-len(ms) % sector)
        n_ms_sect = len(ms) // sector
        # sectors: 0 FAT | 1 DIR | 2 miniFAT | 3.. mini-stream
        minifat = list(range(1, n_mini)) + [ENDOFCHAIN]
        minifat += [FREESECT] * (sector // 4 - len(minifat))
        fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]
        for i in range(n_ms_sect):
            fat.append(3 + i + 1 if i + 1 < n_ms_sect else ENDOFCHAIN)
        fat += [FREESECT] * (sector // 4 - len(fat))
        dirsec = (dirent("Root Entry", 5, 3, len(ms), child=1)
                  + dirent("Workbook", 2, 0, len(stream))
                  + dirent("", 0, 0, 0) + dirent("", 0, 0, 0))
        body = (b"".join(struct.pack("<I", x) for x in fat) + dirsec
                + b"".join(struct.pack("<I", x) for x in minifat) + ms)
        minifat_start, n_minifat = 2, 1
    else:
        stream = stream + b"\x00" * (-len(stream) % sector)
        n_s = len(stream) // sector
        # sectors: 0 FAT | 1 DIR | 2.. stream
        fat = [FATSECT, ENDOFCHAIN]
        for i in range(n_s):
            fat.append(2 + i + 1 if i + 1 < n_s else ENDOFCHAIN)
        fat += [FREESECT] * (sector // 4 - len(fat))
        dirsec = (dirent("Root Entry", 5, ENDOFCHAIN, 0, child=1)
                  + dirent("Workbook", 2, 2, len(stream))
                  + dirent("", 0, 0, 0) + dirent("", 0, 0, 0))
        body = (b"".join(struct.pack("<I", x) for x in fat) + dirsec
                + stream)
        minifat_start, n_minifat = ENDOFCHAIN, 0

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", hdr, 24, 0x003E)
    struct.pack_into("<H", hdr, 26, 0x0003)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<H", hdr, 30, 9)
    struct.pack_into("<H", hdr, 32, 6)
    struct.pack_into("<I", hdr, 44, 1)               # one FAT sector
    struct.pack_into("<I", hdr, 48, 1)               # directory at 1
    struct.pack_into("<I", hdr, 56, 4096)
    struct.pack_into("<I", hdr, 60, minifat_start)
    struct.pack_into("<I", hdr, 64, n_minifat)
    struct.pack_into("<I", hdr, 68, ENDOFCHAIN)      # no extended DIFAT
    struct.pack_into("<I", hdr, 72, 0)
    struct.pack_into("<I", hdr, 76, 0)               # DIFAT[0] = FAT @ 0
    for i in range(1, 109):
        struct.pack_into("<I", hdr, 76 + 4 * i, FREESECT)
    return bytes(hdr) + body


def _default_sheet() -> dict:
    return {"name": "Sheet1", "cells": [
        ("label", 0, 0, "name"), ("label", 0, 1, "qty"),
        ("label", 0, 2, "price"), ("label", 0, 3, "ok"),
        ("label", 1, 0, "alpha"), ("rk_int", 1, 1, 3),
        ("number", 1, 2, 12.5), ("bool", 1, 3, True),
        ("label", 2, 0, "beta"), ("rk_int", 2, 1, -7),
        ("number", 2, 2, 0.25), ("bool", 2, 3, False),
    ]}


class TestXlsReader:
    def _write(self, tmp_path, stream, name="t.xls", **kw):
        p = tmp_path / name
        p.write_bytes(_cfb_container(stream, **kw))
        return str(p)

    def test_reads_fat_layout(self, tmp_path):
        from tanml_ray.sources.xls import read_xls_table

        path = self._write(tmp_path, _workbook_stream([_default_sheet()]),
                           force_mini=False)
        t = read_xls_table(path)
        assert t.column_names == ["name", "qty", "price", "ok"]
        df = t.to_pandas()
        assert list(df["name"]) == ["alpha", "beta"]
        assert list(df["qty"]) == [3.0, -7.0]
        assert list(df["price"]) == [12.5, 0.25]
        assert list(df["ok"]) == [True, False]

    def test_reads_ministream_layout(self, tmp_path):
        """Workbook < 4096 bytes lives in the mini-stream via miniFAT —
        the layout every small real-world .xls uses."""
        from tanml_ray.sources.xls import read_xls_table

        stream = _workbook_stream([_default_sheet()])
        assert len(stream) < 4096
        path = self._write(tmp_path, stream)      # spec cutoff → mini
        df = read_xls_table(path).to_pandas()
        assert list(df["name"]) == ["alpha", "beta"]
        assert list(df["qty"]) == [3.0, -7.0]

    def test_mulrk_and_second_sheet(self, tmp_path):
        from tanml_ray.sources.xls import read_xls_table

        sheets = [_default_sheet(),
                  {"name": "Sheet2", "cells": [
                      ("label", 0, 0, "a"), ("label", 0, 1, "b"),
                      ("label", 0, 2, "c"),
                      ("mulrk", 1, 0, [10, 20, 30])]}]
        path = self._write(tmp_path, _workbook_stream(sheets))
        df = read_xls_table(path, sheet_index=1).to_pandas()
        assert list(df.columns) == ["a", "b", "c"]
        assert df.iloc[0].tolist() == [10.0, 20.0, 30.0]

    def test_read_any_dispatch(self, tmp_path, ray_session):
        from tanml_ray.sources.ingest import read_any

        path = self._write(tmp_path, _workbook_stream([_default_sheet()]))
        ds = read_any(path)
        rows = ds.take_all()
        assert len(rows) == 2 and rows[0]["name"] == "alpha"

    def test_named_errors(self, tmp_path):
        from tanml_ray.sources.xls import read_xls_table

        with pytest.raises(ValueError, match="BIFF version"):
            read_xls_table(self._write(
                tmp_path, _workbook_stream([_default_sheet()],
                                           biff_ver=0x0500), "b5.xls"))
        bad = tmp_path / "notcfb.xls"
        bad.write_bytes(b"\x00" * 600)
        with pytest.raises(ValueError, match="bad magic"):
            read_xls_table(str(bad))
        sheet = {"name": "S", "cells": [("label", 0, 0, "h"),
                                        ("formula", 1, 0, None)]}
        with pytest.raises(ValueError, match="FORMULA"):
            read_xls_table(self._write(
                tmp_path, _workbook_stream([sheet]), "f.xls"))
