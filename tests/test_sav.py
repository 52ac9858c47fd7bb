"""S8 SPSS .sav reader: round-trip against the in-repo writer plus a
hand-built golden file exercising bytecode compression, long strings,
sysmis and big-endian headers — no pyreadstat anywhere."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from tanml_ray.sources.sav import SYSMIS, read_sav_table, write_sav


def test_roundtrip_numeric_string_null(tmp_path):
    t = pa.table({
        "age": pa.array([34.0, None, 61.5, 0.0], type=pa.float64()),
        "name": pa.array(["ada", "grace", "", "annie k"], type=pa.string()),
        "score": pa.array([1.25, -7.0, 1e12, None], type=pa.float64()),
    })
    p = str(tmp_path / "t.sav")
    write_sav(p, t)
    out = read_sav_table(p)
    # writer upper-cases to the 8-char sav namespace
    assert out.column_names == ["AGE", "NAME", "SCORE"]
    assert out.column("AGE").to_pylist() == [34.0, None, 61.5, 0.0]
    assert out.column("NAME").to_pylist() == ["ada", "grace", "", "annie k"]
    assert out.column("SCORE").to_pylist() == [1.25, -7.0, 1e12, None]


def test_roundtrip_long_string_spans_slots(tmp_path):
    long = "x" * 37  # 5 continuation slots
    t = pa.table({"txt": pa.array([long, "short", ""], type=pa.string()),
                  "v": pa.array([1.0, 2.0, 3.0], type=pa.float64())})
    p = str(tmp_path / "long.sav")
    write_sav(p, t)
    out = read_sav_table(p)
    assert out.column("TXT").to_pylist() == [long, "short", ""]
    assert out.column("V").to_pylist() == [1.0, 2.0, 3.0]


def _golden_compressed(codes_and_literals: list, names_types: list,
                       ncases: int, endian: str = "<") -> bytes:
    """Hand-assemble a system file byte-for-byte from the public spec."""
    out = bytearray()
    out += b"$FL2" + b"p" * 60
    out += struct.pack(endian + "iiiii", 2, len(names_types), 1, 0, ncases)
    out += struct.pack(endian + "d", 100.0)
    out += b"d" * 9 + b"t" * 8 + b" " * 64 + b"\x00" * 3
    for name, vtype in names_types:
        out += struct.pack(endian + "iiiii", 2, vtype, 0, 0, 0)
        out += struct.pack(endian + "i", 0)
        out += name.ljust(8).encode()
    out += struct.pack(endian + "ii", 999, 0)
    for chunk in codes_and_literals:
        out += chunk
    return bytes(out)


def test_golden_bytecode_compression(tmp_path):
    # case layout: one numeric var. Three cases: 5 (code 105), literal
    # 2.5 (code 253 + 8-byte block), sysmis (code 255); then EOF (252).
    data = [bytes([105, 253, 255, 252, 0, 0, 0, 0]),
            struct.pack("<d", 2.5)]
    raw = _golden_compressed(data, [("X", 0)], ncases=3)
    p = tmp_path / "g.sav"
    p.write_bytes(raw)
    out = read_sav_table(str(p))
    assert out.column("X").to_pylist() == [5.0, 2.5, None]


def test_golden_bytecode_string_spaces(tmp_path):
    # one 8-byte string var: code 254 = all spaces → trimmed to ""
    # then a literal "hi" padded block
    data = [bytes([254, 253, 252, 0, 0, 0, 0, 0]), b"hi      "]
    raw = _golden_compressed(data, [("S", 8)], ncases=2)
    p = tmp_path / "s.sav"
    p.write_bytes(raw)
    out = read_sav_table(str(p))
    assert out.column("S").to_pylist() == ["", "hi"]


def test_golden_big_endian_uncompressed(tmp_path):
    out = bytearray()
    out += b"$FL2" + b"p" * 60
    out += struct.pack(">iiiii", 2, 1, 0, 0, 2)
    out += struct.pack(">d", 100.0)
    out += b"d" * 9 + b"t" * 8 + b" " * 64 + b"\x00" * 3
    out += struct.pack(">iiiii", 2, 0, 0, 0, 0)
    out += struct.pack(">i", 0) + b"N       "
    out += struct.pack(">ii", 999, 0)
    out += struct.pack(">d", 3.5) + struct.pack(">d", SYSMIS)
    p = tmp_path / "be.sav"
    p.write_bytes(bytes(out))
    t = read_sav_table(str(p))
    assert t.column("N").to_pylist() == [3.5, None]


def test_skips_value_labels_documents_and_extensions(tmp_path):
    out = bytearray()
    out += b"$FL2" + b"p" * 60
    out += struct.pack("<iiiii", 2, 1, 0, 0, 1)
    out += struct.pack("<d", 100.0)
    out += b"d" * 9 + b"t" * 8 + b" " * 64 + b"\x00" * 3
    out += struct.pack("<iiiii", 2, 0, 0, 0, 0)
    out += struct.pack("<i", 0) + b"V       "
    # value labels: one (value, label) pair, label "yes" (len 3 →
    # total (3+8)//8*8 = 8 bytes incl the length byte)
    out += struct.pack("<ii", 3, 1)
    out += struct.pack("<d", 1.0) + bytes([3]) + b"yes    "
    out += struct.pack("<ii", 4, 1) + struct.pack("<i", 1)
    # documents: 1 line of 80 chars
    out += struct.pack("<ii", 6, 1) + b"D" * 80
    # extension record: subtype 99, 4-byte units × 3
    out += struct.pack("<iiii", 7, 99, 4, 3) + struct.pack("<iii", 9, 9, 9)
    out += struct.pack("<ii", 999, 0)
    out += struct.pack("<d", 42.0)
    p = tmp_path / "rich.sav"
    p.write_bytes(bytes(out))
    t = read_sav_table(str(p))
    assert t.column("V").to_pylist() == [42.0]


def test_read_any_routes_sav(tmp_path, ray_session):
    from tanml_ray.sources.ingest import read_any

    t = pa.table({"a": pa.array([1.0, 2.0], type=pa.float64())})
    p = str(tmp_path / "r.sav")
    write_sav(p, t)
    ds = read_any(p)
    got = ds.take_all()
    assert [r["A"] for r in got] == [1.0, 2.0]


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.sav"
    p.write_bytes(b"NOPE" + b"\x00" * 200)
    with pytest.raises(ValueError, match="magic"):
        read_sav_table(str(p))


def test_integer_valued_doubles_survive_exactly(tmp_path):
    vals = [float(x) for x in np.arange(0, 300, 7)]
    t = pa.table({"k": pa.array(vals, type=pa.float64())})
    p = str(tmp_path / "i.sav")
    write_sav(p, t)
    assert read_sav_table(p).column("K").to_pylist() == vals
