"""Stdlib real-format codecs (stages/codecs.py) and the multimodal
stages running END-TO-END on real BMP / PGM / PPM / WAV / AVI bytes —
no fake codec, no monkeypatched PIL."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tanml_ray.stages.codecs import (
    decode_avi_gray,
    decode_bmp_gray,
    decode_pnm_gray,
    decode_wav,
    encode_avi_gray,
    encode_bmp_gray,
    encode_pgm,
    encode_ppm,
    encode_wav_pcm16,
)
from tanml_ray.stages.multimodal import (
    decode_audio_auto,
    decode_image_auto,
    decode_video_auto,
    encode_fake_image,
)


def _luma(rgb):
    r, g, b = (rgb[..., i].astype(np.uint32) for i in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


class TestCodecRoundtrips:
    def test_bmp_gray_roundtrip(self):
        img = np.random.default_rng(1).integers(0, 256, (37, 53), dtype=np.uint8)
        blob = encode_bmp_gray(img)
        assert blob[:2] == b"BM"
        np.testing.assert_array_equal(decode_bmp_gray(blob), img)

    def test_bmp_24bit_color(self):
        """Hand-built 24-bit BI_RGB BMP (bottom-up, padded rows)."""
        import struct

        rng = np.random.default_rng(2)
        h, w = 5, 6
        bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr[::-1].reshape(h, w * 3)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           rows.nbytes, 0, 0, 0, 0)
        off = 14 + 40
        head = struct.pack("<2sIHHI", b"BM", off + rows.nbytes, 0, 0, off)
        got = decode_bmp_gray(head + info + rows.tobytes())
        np.testing.assert_array_equal(got, _luma(bgr[..., [2, 1, 0]]))

    def test_pgm_roundtrip_and_comments(self):
        img = np.random.default_rng(3).integers(0, 256, (11, 9), dtype=np.uint8)
        np.testing.assert_array_equal(decode_pnm_gray(encode_pgm(img)), img)
        with_comment = (b"P5\n# written by some tool\n9 11\n255\n"
                        + img.tobytes())
        np.testing.assert_array_equal(decode_pnm_gray(with_comment), img)

    def test_ppm_luma(self):
        rgb = np.random.default_rng(4).integers(0, 256, (10, 11, 3),
                                                dtype=np.uint8)
        np.testing.assert_array_equal(decode_pnm_gray(encode_ppm(rgb)),
                                      _luma(rgb))

    def test_wav_roundtrip_mono16(self):
        s = (np.sin(np.arange(32000) / 100.0) * 8000).astype(np.int16)
        rate, back = decode_wav(encode_wav_pcm16(s, 22050))
        assert rate == 22050
        np.testing.assert_array_equal(back, s)

    def test_wav_stereo_downmix_and_8bit(self):
        import io
        import wave

        left = np.arange(-1000, 1000, 10, dtype=np.int16)
        right = left + 100
        inter = np.empty(left.size * 2, dtype=np.int16)
        inter[0::2], inter[1::2] = left, right
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(2)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(inter.astype("<i2").tobytes())
        rate, mono = decode_wav(buf.getvalue())
        assert rate == 8000
        np.testing.assert_array_equal(
            mono, ((left.astype(np.int32) + right) / 2).astype(np.int16))

        buf8 = io.BytesIO()
        with wave.open(buf8, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(8000)
            wf.writeframes(bytes([0, 128, 255]))
        _, s8 = decode_wav(buf8.getvalue())
        np.testing.assert_array_equal(s8, [-32768, 0, 32512])

    def test_avi_roundtrip(self):
        frames = np.random.default_rng(5).integers(0, 256, (7, 24, 33),
                                                   dtype=np.uint8)
        blob = encode_avi_gray(frames, fps=12)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
        np.testing.assert_array_equal(decode_avi_gray(blob), frames)

    def test_auto_dispatch_and_unknown_magic(self):
        img = np.random.default_rng(6).integers(0, 256, (8, 8), dtype=np.uint8)
        np.testing.assert_array_equal(decode_image_auto(encode_bmp_gray(img)), img)
        np.testing.assert_array_equal(decode_image_auto(encode_pgm(img)), img)
        np.testing.assert_array_equal(decode_image_auto(encode_fake_image(img)), img)
        with pytest.raises(ValueError, match="Pillow"):
            decode_image_auto(b"\x89PNG\r\n\x1a\n")
        with pytest.raises(ValueError, match="WAV"):
            decode_audio_auto(b"OggS junk")
        with pytest.raises(ValueError, match="AVI"):
            decode_video_auto(b"\x00\x00\x00 ftypmp42")


@pytest.mark.usefixtures("ray_session")
class TestRealFormatPipelines:
    """The multimodal operators end-to-end on REAL bytes: planted
    near-dups must land; the decode branch is the stdlib codec tier
    (the fake decoders would reject these magics)."""

    def test_image_resize_on_mixed_real_formats(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import ImageResizeStage

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (40, 30), dtype=np.uint8)
        rgb = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
        rows = [{"id": 0, "image": encode_bmp_gray(px)},
                {"id": 1, "image": encode_pgm(px)},
                {"id": 2, "image": encode_ppm(rgb)},
                {"id": 3, "image": encode_fake_image(px)},
                {"id": 4, "image": None}]
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
        out = {r["id"]: r for r in ds.map_batches(
            ImageResizeStage(8, 8), batch_format="pyarrow",
            batch_size=2, concurrency=2).take_all()}
        # BMP, PGM and FIMG of the same pixels → identical outputs
        assert out[0]["resized"] == out[1]["resized"] == out[3]["resized"]
        assert out[0]["mean_pixel"] == pytest.approx(px.mean())
        assert out[2]["mean_pixel"] == pytest.approx(_luma(rgb).mean())
        assert out[4]["resized"] is None

    def test_image_near_dups_on_bmp(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import image_near_dups

        rng = np.random.default_rng(12)
        rows = [{"id": i, "image": encode_bmp_gray(
                    rng.integers(0, 256, (48, 64), dtype=np.uint8))}
                for i in range(30)]
        base = rng.integers(0, 200, (48, 64), dtype=np.uint8)
        rows.append({"id": 100, "image": encode_bmp_gray(base)})
        rows.append({"id": 101, "image": encode_pgm(base)})  # cross-format dup
        rows.append({"id": 102, "image": encode_bmp_gray(
            np.clip(base.astype(np.int16) + 12, 0, 255).astype(np.uint8))})
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        got = {(r["id_a"], r["id_b"])
               for r in image_near_dups(ds, max_hamming=6).to_pylist()}
        assert (100, 101) in got
        assert (100, 102) in got or (101, 102) in got
        assert all(a >= 100 for a, _ in got)

    def test_audio_features_and_near_dups_on_wav(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import (AudioFeatureStage,
                                                 audio_near_dups)

        rng = np.random.default_rng(13)
        t = np.arange(64 * 1024)
        base = (np.sin(t / 700.0)
                * (3000 + 2500 * np.sin(t / 9000.0))).astype(np.int16)
        louder = np.clip(base.astype(np.float64) * 1.8,
                         -32768, 32767).astype(np.int16)
        rows = [{"id": i, "audio": encode_wav_pcm16(
                    rng.integers(-8000, 8000, 32 * 1024).astype(np.int16))}
                for i in range(15)]
        rows.append({"id": 100, "audio": encode_wav_pcm16(base)})
        rows.append({"id": 101, "audio": encode_wav_pcm16(louder)})
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)

        feats = {r["id"]: r for r in ds.map_batches(
            AudioFeatureStage(frame=1024), batch_format="pyarrow",
            batch_size=4, concurrency=2).take_all()}
        assert feats[100]["duration_sec"] == pytest.approx(64 * 1024 / 16000)
        assert len(feats[100]["frame_energy"]) == 64

        got = {(r["id_a"], r["id_b"])
               for r in audio_near_dups(ds, max_hamming=6).to_pylist()}
        assert (100, 101) in got
        assert all(a >= 100 for a, _ in got)

    def test_video_near_dups_on_avi(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import video_near_dups

        rng = np.random.default_rng(14)
        t = np.arange(24 * 24, dtype=np.float64).reshape(24, 24)
        base = np.stack([((t * (1 + f / 40.0)) % 251).astype(np.uint8)
                         for f in range(20)])
        edited = base.copy()
        edited[3] = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        rows = [{"id": 100, "video": encode_avi_gray(base)},
                {"id": 101, "video": encode_avi_gray(edited)}]
        rows += [{"id": i, "video": encode_avi_gray(
                     rng.integers(0, 256, (20, 24, 24)).astype(np.uint8))}
                 for i in range(8)]
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        got = {(r["id_a"], r["id_b"])
               for r in video_near_dups(ds, max_hamming=6,
                                        every_k=2).to_pylist()}
        assert (100, 101) in got
        assert all(a >= 100 for a, _ in got)

    def test_video_frame_sample_on_avi(self):
        import ray.data as rd

        from tanml_ray.stages.multimodal import (VideoFrameSampleStage,
                                                 decode_fake_image)

        frames = np.random.default_rng(15).integers(
            0, 256, (12, 8, 8), dtype=np.uint8)
        ds = rd.from_arrow(pa.Table.from_pylist(
            [{"id": 1, "video": encode_avi_gray(frames)}]))
        out = ds.map_batches(VideoFrameSampleStage(every_k=5),
                             batch_format="pyarrow").take_all()
        assert [(r["id"], r["frame_no"]) for r in out] == [(1, 0), (1, 5), (1, 10)]
        np.testing.assert_array_equal(decode_fake_image(out[0]["image"]),
                                      frames[0])
