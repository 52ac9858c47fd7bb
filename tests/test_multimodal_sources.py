"""Multimodal actor-pool stages, CSV ingestion, schema alignment."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tanml_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    decode_fake_image,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
)


def _rng():
    return np.random.default_rng(42)


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def _image_ds(self, n=40):
        import ray.data as rd

        rng = _rng()
        rows = []
        for i in range(n):
            px = (rng.integers(0, 256, (64, 48))).astype(np.uint8)
            rows.append({"id": i, "image": encode_fake_image(px)})
        rows.append({"id": n, "image": None})
        return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def test_image_resize_actor_pool(self):
        ds = self._image_ds()
        out = ds.map_batches(ImageResizeStage(16, 16), batch_format="pyarrow",
                             batch_size=8, concurrency=2)
        rows = out.take_all()
        assert len(rows) == 41
        ok = [r for r in rows if r["resized"] is not None]
        assert len(ok) == 40
        for r in ok[:5]:
            img = np.frombuffer(r["resized"], dtype=np.uint8).reshape(16, 16)
            assert img.shape == (16, 16)
            assert 0 <= r["mean_pixel"] <= 255
        assert rows[-1]["resized"] is None or any(r["resized"] is None for r in rows)

    def test_real_codec_raises_cleanly(self):
        with pytest.raises(NotImplementedError, match="Pillow"):
            ImageResizeStage(use_real_codec=True)

    def test_real_codec_branch_uses_pil(self, monkeypatch):
        """With a (stubbed) PIL importable and use_real_codec=True, the
        stage must decode through PIL — not silently fall back to the
        fake codec (the fake decoder would reject these bytes)."""
        import sys
        import types

        decoded = np.arange(64, dtype=np.uint8).reshape(8, 8)
        calls = []

        class _Im:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def convert(self, mode):
                calls.append(mode)
                return decoded

        image_mod = types.SimpleNamespace(open=lambda buf: _Im())
        pil = types.ModuleType("PIL")
        pil.Image = image_mod
        monkeypatch.setitem(sys.modules, "PIL", pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

        stage = ImageResizeStage(4, 4, use_real_codec=True)
        assert stage._real is True
        batch = pa.table({"id": pa.array([1], type=pa.int64()),
                          "image": pa.array([b"\x89PNG not-fake-magic"],
                                            type=pa.binary())})
        out = stage(batch)
        assert calls == ["L"]  # PIL path taken, grayscale conversion
        img = np.frombuffer(out.column("resized")[0].as_py(),
                            dtype=np.uint8).reshape(4, 4)
        np.testing.assert_array_equal(img, decoded[::2][:, ::2])
        assert out.column("mean_pixel")[0].as_py() == decoded.mean()

    def test_image_roundtrip(self):
        px = _rng().integers(0, 256, (10, 7)).astype(np.uint8)
        np.testing.assert_array_equal(decode_fake_image(encode_fake_image(px)), px)

    def test_audio_features(self):
        import ray.data as rd

        rng = _rng()
        rows = [{"id": i, "audio": encode_fake_audio(
            (rng.normal(0, 1000, 16000 * 2)).astype(np.int16))} for i in range(10)]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = ds.map_batches(AudioFeatureStage(frame=1024), batch_format="pyarrow",
                             batch_size=4, concurrency=2).take_all()
        assert len(out) == 10
        for r in out:
            assert r["duration_sec"] == pytest.approx(2.0)
            assert len(r["frame_energy"]) == 16000 * 2 // 1024

    def test_video_frame_sampling_flatmap(self):
        import ray.data as rd

        rng = _rng()
        frames = rng.integers(0, 256, (12, 8, 8)).astype(np.uint8)
        rows = [{"id": 1, "video": encode_fake_video(frames)},
                {"id": 2, "video": None}]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = ds.map_batches(VideoFrameSampleStage(every_k=5),
                             batch_format="pyarrow").take_all()
        assert [(r["id"], r["frame_no"]) for r in out] == [(1, 0), (1, 5), (1, 10)]
        img = decode_fake_image(out[0]["image"])
        np.testing.assert_array_equal(img, frames[0])


@pytest.mark.usefixtures("ray_session")
class TestIngestion:
    def test_csv_roundtrip_with_na_tokens(self, tmp_path):
        from tanml_ray.sources.ingest import ingest_csv_to_parquet

        csv = tmp_path / "in.csv"
        csv.write_text("a,b,c\n1,x,0.5\n2,?,1.5\n3,NA,N/A\n4,y,2.5\n")
        out = ingest_csv_to_parquet([str(csv)], str(tmp_path / "out"), num_files=2)
        t = pq.read_table(out)
        assert t.num_rows == 4
        b = dict(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))
        assert b[2] is None and b[3] is None and b[1] == "x"
        c = dict(zip(t.column("a").to_pylist(), t.column("c").to_pylist()))
        assert c[3] is None and c[4] == 2.5


@pytest.mark.usefixtures("ray_session")
class TestSchemaAlign:
    def test_align_and_violations(self):
        import ray.data as rd

        from tanml_ray.stages.schema_align import align_dataset, compare_schemas

        target = pa.schema([("a", pa.float64()), ("b", pa.string())])
        tbl = pa.table({"b": ["x", "y"], "a": [1, 2], "extra": [0, 0]})
        ds = rd.from_arrow(tbl)
        aligned, res = align_dataset(ds, target)
        out = aligned.take_all()
        assert list(out[0].keys()) == ["a", "b"]
        assert isinstance(out[0]["a"], float)
        assert res.extra_columns == ["extra"]
        assert res.coerced_columns == ["a"]

        missing = compare_schemas(target, pa.schema([("b", pa.string())]))
        assert missing.missing_columns == ["a"] and not missing.ok


@pytest.mark.usefixtures("ray_session")
class TestRowFilters:
    def test_drop_missing_and_nonfinite(self):
        import ray.data as rd

        from tanml_ray.functions.collect import collect_pylist
        from tanml_ray.functions.filters import drop_missing, drop_nonfinite_target

        tbl = pa.table({"x": [1.0, None, 3.0, float("nan"), 5.0],
                        "y": [1.0, 2.0, None, 4.0, float("inf")]})
        ds = rd.from_arrow(tbl)
        # dropna semantics: null/NaN are missing, ±inf is NOT (M8)
        kept = collect_pylist(drop_missing(ds, ["x", "y"]))
        assert [r["x"] for r in kept] == [1.0, 5.0]

        kept_t = collect_pylist(drop_nonfinite_target(ds, "y"))
        assert [r["y"] for r in kept_t] == [1.0, 2.0, 4.0]


@pytest.mark.usefixtures("ray_session")
class TestReadAnyFallback:
    def test_known_extensions(self, tmp_path, sf_dir):
        from tanml_ray.sources.ingest import read_any

        assert read_any(f"{sf_dir}/region.parquet").count() > 0
        p = tmp_path / "t.csv"
        p.write_text("a,b\n1,x\n2,?\n")
        rows = read_any(str(p)).take_all()
        assert rows[1]["b"] is None  # NA token handling preserved

    def test_orc_roundtrip_distributed(self, tmp_path):
        """ORC source/sink: in-task decode (no native reader in this
        Ray version), partitioned write, byte-identical roundtrip."""
        import ray.data as rd

        from tanml_ray.sources.ingest import read_any, read_orc, write_orc

        t = pa.table({"a": pa.array(range(100), type=pa.int64()),
                      "b": pa.array([f"s{i}" for i in range(100)])})
        out = str(tmp_path / "orc_out")
        write_orc(rd.from_arrow(t).repartition(4), out, num_files=4)
        files = sorted(str(p) for p in (tmp_path / "orc_out").iterdir())
        assert len(files) == 4
        back = sorted(read_orc(files).take_all(), key=lambda r: r["a"])
        assert back == sorted(t.to_pylist(), key=lambda r: r["a"])
        one = sorted(read_any(files[0]).take_all(), key=lambda r: r["a"])
        assert 0 < len(one) < 100  # extension dispatch hits the ORC path

    def test_pickle_payloads(self, tmp_path):
        """S7 pickle source: DataFrame, Table and dict payloads land as
        Datasets; unsupported payloads raise."""
        import pickle

        import pandas as pd

        from tanml_ray.sources.ingest import read_any

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        for name, obj in [("df.pkl", df),
                          ("tbl.pickle", pa.table({"a": [1, 2],
                                                   "b": ["x", "y"]})),
                          ("d.pkl", {"a": [1, 2], "b": ["x", "y"]})]:
            p = tmp_path / name
            p.write_bytes(pickle.dumps(obj))
            rows = read_any(str(p)).take_all()
            assert rows == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
        bad = tmp_path / "bad.pkl"
        bad.write_bytes(pickle.dumps([1, 2, 3]))
        with pytest.raises(TypeError, match="pickle payload"):
            read_any(str(bad))

    def test_unknown_extension_comma(self, tmp_path):
        from tanml_ray.sources.ingest import read_any

        p = tmp_path / "iris.data"
        p.write_text("a,b,c\n1,2,3\n4,5,6\n")
        rows = read_any(str(p)).take_all()
        assert rows == [{"a": 1, "b": 2, "c": 3}, {"a": 4, "b": 5, "c": 6}]

    def test_unknown_extension_sniffed_sep(self, tmp_path):
        from tanml_ray.sources.ingest import read_any

        p = tmp_path / "table.unknown"
        p.write_text("a;b\n1;2\n3;4\n")
        rows = read_any(str(p)).take_all()
        assert rows == [{"a": 1, "b": 2}, {"a": 3, "b": 4}]

    def test_unknown_extension_latin1(self, tmp_path):
        from tanml_ray.sources.ingest import read_any

        p = tmp_path / "names.info"
        p.write_bytes("name,city\nren\xe9,k\xf6ln\n".encode("latin-1"))
        rows = read_any(str(p)).take_all()
        assert rows[0]["name"] == "rené"

    def test_utf8_straddling_probe_boundary_stays_utf8(self, tmp_path):
        """A multibyte char cut by the 64 KiB sniff head must NOT flip
        the encoding decision to latin-1 (mojibake)."""
        from tanml_ray.sources.ingest import _sniff_delimited

        probe = 64 << 10
        p = tmp_path / "big.data"
        # byte `probe-1` is the FIRST byte of the 2-byte 'é' — the
        # sniff head ends mid-character
        body = (b"a,b\n" + b"c" * (probe - 1 - 4)
                + "é,z\n1,2\n".encode("utf-8"))
        p.write_bytes(body)
        sep, enc = _sniff_delimited(str(p))
        assert (sep, enc) == (",", "utf-8")

    def test_whole_file_truncated_utf8_falls_back(self, tmp_path):
        """A file that itself ends mid-multibyte-char is NOT probe
        truncation — it must fall through to latin-1 (classifying it
        utf-8 would crash the full read later)."""
        from tanml_ray.sources.ingest import _sniff_delimited

        p = tmp_path / "cut.data"
        p.write_bytes(b"a,b\n1,2\n" + "é".encode("utf-8")[:1])
        sep, enc = _sniff_delimited(str(p))
        assert (sep, enc) == (",", "latin-1")

    def test_sav_truncated_raises(self, tmp_path):
        from tanml_ray.sources.ingest import read_any

        p = tmp_path / "survey.sav"
        p.write_bytes(b"$FL2@(#) SPSS DATA FILE fake header")
        with pytest.raises(ValueError, match="truncated"):
            read_any(str(p))

    def test_unparseable_raises(self, tmp_path):
        from tanml_ray.sources.ingest import read_any

        p = tmp_path / "blob.bin"
        p.write_bytes(bytes(range(256)) * 4)
        with pytest.raises(ValueError, match="delimited"):
            read_any(str(p))


@pytest.mark.usefixtures("ray_session")
class TestFormatReaders:
    def test_feather_roundtrip(self, tmp_path):
        import pyarrow as pa_
        from pyarrow import feather

        from tanml_ray.sources.ingest import read_any

        t = pa_.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        p = str(tmp_path / "t.feather")
        feather.write_feather(t, p)
        assert read_any(p).take_all() == t.to_pylist()

    def test_stata_roundtrip(self, tmp_path):
        import pandas as pd

        from tanml_ray.sources.ingest import read_any

        df = pd.DataFrame({"a": [1.5, 2.5], "b": ["u", "v"]})
        p = str(tmp_path / "t.dta")
        df.to_stata(p, write_index=False)
        rows = read_any(p).take_all()
        assert [r["a"] for r in rows] == [1.5, 2.5]
        assert [r["b"] for r in rows] == ["u", "v"]

    def test_xlsx_minimal_reader(self, tmp_path):
        """Hand-built SpreadsheetML zip (openpyxl is absent, so the
        test constructs the format the same way the parser reads it:
        shared strings + inline strings + numbers)."""
        import zipfile

        from tanml_ray.sources.ingest import read_any

        sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>score</t></is></c></row>
<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>1.5</v></c></row>
<row r="3"><c r="A3" t="s"><v>2</v></c><c r="B3"><v>42</v></c></row>
</sheetData></worksheet>"""
        shared = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>name</t></si><si><t>alice</t></si><si><t>bob</t></si></sst>"""
        p = str(tmp_path / "t.xlsx")
        with zipfile.ZipFile(p, "w") as z:
            z.writestr("xl/worksheets/sheet1.xml", sheet)
            z.writestr("xl/sharedStrings.xml", shared)
        rows = read_any(p).take_all()
        assert rows == [{"name": "alice", "score": 1.5},
                        {"name": "bob", "score": 42.0}]


@pytest.mark.usefixtures("ray_session")
class TestImagePhashDedup:
    def _images(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import encode_fake_image

        rng = np.random.default_rng(77)
        rows = []
        # 40 distinct random images
        for i in range(40):
            rows.append({"id": i, "image": encode_fake_image(
                rng.integers(0, 256, (48, 64), dtype=np.uint8).astype(np.uint8))})
        # planted: 100/101 identical, 102 = 100 + slight brightness shift
        base = rng.integers(0, 200, (48, 64), dtype=np.uint8).astype(np.uint8)
        rows.append({"id": 100, "image": encode_fake_image(base)})
        rows.append({"id": 101, "image": encode_fake_image(base)})
        rows.append({"id": 102, "image": encode_fake_image(
            np.clip(base.astype(np.int16) + 12, 0, 255).astype(np.uint8))})
        rows.append({"id": 103, "image": None})
        return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def test_phash_properties(self):
        from tanml_ray.pipelines.dedup import hamming64
        from tanml_ray.stages.multimodal import phash64

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (64, 80), dtype=np.uint8).astype(np.uint8)
        assert phash64(img) == phash64(img)  # deterministic
        # brightness shift barely moves the hash
        shifted = np.clip(img.astype(np.int16) + 20, 0, 255).astype(np.uint8)
        assert hamming64(phash64(img), phash64(shifted)) <= 6
        # resize invariance (nearest 2x upscale)
        big = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        assert hamming64(phash64(img), phash64(big)) <= 6
        # unrelated image is far
        other = rng.integers(0, 256, (64, 80), dtype=np.uint8).astype(np.uint8)
        assert hamming64(phash64(img), phash64(other)) > 10

    def test_pipeline_finds_planted(self):
        from tanml_ray.stages.multimodal import image_near_dups

        pairs = image_near_dups(self._images(), max_hamming=6).to_pylist()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (100, 101) in got
        assert (100, 102) in got or (101, 102) in got
        # no random-image false positives at this distance
        assert all(a >= 100 and b >= 100 for a, b in got)


@pytest.mark.usefixtures("ray_session")
class TestAudioFingerprintDedup:
    def test_fingerprint_gain_invariant_and_pipeline(self):
        import ray.data as rd

        from tanml_ray.pipelines.dedup import hamming64
        from tanml_ray.stages.multimodal import (
            audio_fingerprint64,
            audio_near_dups,
            encode_fake_audio,
        )

        rng = np.random.default_rng(19)
        t = np.arange(64 * 1024)
        base = (np.sin(t / 700.0) * (3000 + 2500 * np.sin(t / 9000.0))).astype(np.int16)
        louder = np.clip(base.astype(np.float64) * 1.8, -32768, 32767).astype(np.int16)
        fp_b = audio_fingerprint64(base)
        fp_l = audio_fingerprint64(louder)
        assert hamming64(fp_b, fp_l) <= 4  # gain changes barely move it
        noise = rng.integers(-8000, 8000, base.size).astype(np.int16)
        assert hamming64(fp_b, audio_fingerprint64(noise)) > 10

        rows = [{"id": i, "audio": encode_fake_audio(
                    rng.integers(-8000, 8000, 32 * 1024).astype(np.int16))}
                for i in range(20)]
        rows.append({"id": 100, "audio": encode_fake_audio(base)})
        rows.append({"id": 101, "audio": encode_fake_audio(louder)})
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        pairs = audio_near_dups(ds, max_hamming=6).to_pylist()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (100, 101) in got
        assert all(a >= 100 for a, _ in got)


@pytest.mark.usefixtures("ray_session")
class TestVideoNearDup:
    def test_finds_planted_edited_copy(self):
        """A video with a few re-shot (noise-perturbed) frames must
        still pair with its original (per-bit majority across frame
        pHashes absorbs minority-frame edits); unrelated videos with
        random content must not pair."""
        import ray.data as rd

        from tanml_ray.stages.multimodal import (encode_fake_video,
                                                 video_near_dups)

        rng = np.random.default_rng(23)
        # structured base: smooth gradient frames (pHash-stable)
        t = np.arange(24 * 24, dtype=np.float64).reshape(24, 24)
        base = np.stack([((t * (1 + f / 40.0)) % 251).astype(np.uint8)
                         for f in range(20)])
        edited = base.copy()
        edited[3] = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        edited[11] = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        rows = [{"id": 100, "video": encode_fake_video(base)},
                {"id": 101, "video": encode_fake_video(edited)},
                {"id": 102, "video": None}]
        rows += [{"id": i, "video": encode_fake_video(
                     rng.integers(0, 256, (20, 24, 24)).astype(np.uint8))}
                 for i in range(10)]
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        pairs = video_near_dups(ds, max_hamming=6, every_k=2).to_pylist()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (100, 101) in got
        assert all(a >= 100 for a, _ in got)

    def test_deterministic_across_layouts(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import (encode_fake_video,
                                                 video_near_dups)

        rng = np.random.default_rng(9)
        rows = [{"id": i, "video": encode_fake_video(
                    rng.integers(0, 256, (12, 16, 16)).astype(np.uint8))}
                for i in range(8)]
        rows.append({"id": 50, "video": rows[0]["video"]})
        a = video_near_dups(rd.from_arrow(pa.Table.from_pylist(rows))
                            .repartition(2), max_hamming=3).to_pylist()
        b = video_near_dups(rd.from_arrow(pa.Table.from_pylist(rows))
                            .repartition(5), max_hamming=3).to_pylist()
        assert a == b
        assert {(r["id_a"], r["id_b"]) for r in a} == {(0, 50)}
