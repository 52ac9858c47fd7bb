"""Multimodal columns: image / audio / video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The reference is tabular-only; these stages are the training-data-
pipeline operators the task mandates ("treat image/audio/video as
opaque binary columns ... STUB the decode step"). The Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested; the codec is either

  * a REAL stdlib tier (stages/codecs.py): BMP / binary PGM / PPM
    images, RIFF PCM WAV audio (stdlib `wave`), and uncompressed
    8-bit-DIB AVI video — genuine interchange formats decoded with
    numpy + the standard library only, auto-detected by magic bytes
    in every stage below, or
  * a real library decode (PIL / soundfile) IF importable — this
    container has neither, so that path raises a clear
    NotImplementedError naming the missing dependency, or
  * the deterministic FAKE codec below (self-describing binary
    headers), which exercises byte-parsing, numpy decode, resize /
    feature-extract / frame-sample for tests and benchmarks.

Fake formats (little-endian):
  image: b"FIMG" + uint16 w + uint16 h + w*h uint8 gray pixels
  audio: b"FAUD" + uint32 sample_rate + int16 samples...
  video: b"FVID" + uint16 n_frames + uint16 w + uint16 h + frames...

Batch-size guidance: large binary payloads → SMALL batch_size (the
decoded ndarray is w·h·n_frames bytes per row; size batch_size ×
concurrency × payload to the worker heap, SURVEY.md §4.1).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

IMAGE_MAGIC = b"FIMG"
AUDIO_MAGIC = b"FAUD"
VIDEO_MAGIC = b"FVID"


# -- fake codec (deterministic, test/bench path) ----------------------------

def encode_fake_image(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    return IMAGE_MAGIC + struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()


def decode_fake_image(blob: bytes) -> np.ndarray:
    if blob[:4] != IMAGE_MAGIC:
        raise ValueError("not a FIMG payload")
    w, h = struct.unpack("<HH", blob[4:8])
    return np.frombuffer(blob[8:8 + w * h], dtype=np.uint8).reshape(h, w)


def encode_fake_audio(samples: np.ndarray, rate: int = 16000) -> bytes:
    return AUDIO_MAGIC + struct.pack("<I", rate) + samples.astype(np.int16).tobytes()


def decode_fake_audio(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != AUDIO_MAGIC:
        raise ValueError("not a FAUD payload")
    (rate,) = struct.unpack("<I", blob[4:8])
    return rate, np.frombuffer(blob[8:], dtype=np.int16)


def encode_fake_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return (VIDEO_MAGIC + struct.pack("<HHH", n, w, h)
            + frames.astype(np.uint8).tobytes())


def decode_fake_video(blob: bytes) -> np.ndarray:
    if blob[:4] != VIDEO_MAGIC:
        raise ValueError("not a FVID payload")
    n, w, h = struct.unpack("<HHH", blob[4:10])
    return np.frombuffer(blob[10:10 + n * w * h], dtype=np.uint8).reshape(n, h, w)


# -- magic-byte format dispatch (fake codec | stdlib real codecs) ------------

def decode_image_auto(blob: bytes, pil_image=None) -> np.ndarray:
    """Decode an image blob to uint8 (h, w) grayscale, dispatching on
    magic bytes: FIMG (fake), BMP, binary PGM/PPM (stdlib tier —
    stages/codecs.py), else PIL if a module was supplied."""
    from tanml_ray.stages import codecs

    head = bytes(blob[:4])
    if head == IMAGE_MAGIC:
        return decode_fake_image(blob)
    if head[:2] == b"BM":
        return codecs.decode_bmp_gray(blob)
    if head[:2] in (b"P5", b"P6"):
        return codecs.decode_pnm_gray(blob)
    if pil_image is not None:
        import io

        with pil_image.open(io.BytesIO(blob)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    raise ValueError(
        f"unsupported image format (magic {head!r}): FIMG/BMP/PGM/PPM "
        "decode with the stdlib tier; other formats need Pillow "
        "(use_real_codec=True)")


def decode_audio_auto(blob: bytes) -> tuple[int, np.ndarray]:
    """(rate, int16 samples) from FAUD (fake) or RIFF PCM WAV."""
    from tanml_ray.stages import codecs

    if blob[:4] == AUDIO_MAGIC:
        return decode_fake_audio(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return codecs.decode_wav(blob)
    raise ValueError(
        f"unsupported audio format (magic {bytes(blob[:4])!r}): "
        "FAUD and PCM WAV decode with the stdlib tier")


def decode_video_auto(blob: bytes) -> np.ndarray:
    """uint8 (n, h, w) frames from FVID (fake) or uncompressed-DIB AVI."""
    from tanml_ray.stages import codecs

    if blob[:4] == VIDEO_MAGIC:
        return decode_fake_video(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return codecs.decode_avi_gray(blob)
    raise ValueError(
        f"unsupported video format (magic {bytes(blob[:4])!r}): "
        "FVID and uncompressed-DIB AVI decode with the stdlib tier")


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape
    ri = (np.arange(out_h) * h // out_h).clip(max=h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(max=w - 1)
    return img[ri][:, ci]


# -- actor-pool stages ------------------------------------------------------

class ImageResizeStage:
    """Actor-pool stage: decode → resize → stats. Use as
    ds.map_batches(ImageResizeStage(h, w), concurrency=N, batch_size=B,
    num_cpus=1) — B small (each decoded row is h·w bytes on the heap).

    With `use_real_codec=True` a PIL decode path is attempted once per
    ACTOR in __init__ (not per batch); missing library raises
    NotImplementedError immediately at pool start, not mid-stream.
    """

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 image_col: str = "image", id_col: str = "id",
                 use_real_codec: bool = False):
        self.out_h, self.out_w = out_h, out_w
        self.image_col, self.id_col = image_col, id_col
        self._real = False
        self._Image = None
        if use_real_codec:
            try:
                from PIL import Image
            except ImportError as ex:
                raise NotImplementedError(
                    "real image decode requires Pillow, which is not "
                    "installed in this environment; use the deterministic "
                    "fake codec (use_real_codec=False)") from ex
            self._Image = Image
            self._real = True

    def _decode(self, blob: bytes) -> "np.ndarray":
        """Grayscale uint8 (h, w). FIMG/BMP/PGM/PPM decode via the
        stdlib tier regardless of use_real_codec; other formats go
        through PIL when available (imported once per ACTOR in
        __init__, never per batch)."""
        return decode_image_auto(blob, self._Image if self._real else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.image_col).to_pylist()
        out_pixels: list[bytes | None] = []
        means: list[float | None] = []
        for blob in blobs:
            if blob is None:
                out_pixels.append(None)
                means.append(None)
                continue
            img = self._decode(blob)
            small = _resize_nearest(img, self.out_h, self.out_w)
            out_pixels.append(small.tobytes())
            means.append(float(img.mean()))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "resized": pa.array(out_pixels, type=pa.binary()),
            "height": pa.array([self.out_h] * len(blobs), type=pa.int32()),
            "width": pa.array([self.out_w] * len(blobs), type=pa.int32()),
            "mean_pixel": pa.array(means, type=pa.float64()),
        })


class AudioFeatureStage:
    """Actor-pool stage: decode fake audio → frame energies
    (list<float>) + duration."""

    def __init__(self, frame: int = 1024, audio_col: str = "audio",
                 id_col: str = "id"):
        self.frame = frame
        self.audio_col, self.id_col = audio_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.audio_col).to_pylist()
        energies: list[list[float] | None] = []
        durs: list[float | None] = []
        for blob in blobs:
            if blob is None:
                energies.append(None)
                durs.append(None)
                continue
            rate, samples = decode_audio_auto(blob)
            n = (len(samples) // self.frame) * self.frame
            if n:
                frames = samples[:n].astype(np.float64).reshape(-1, self.frame)
                energies.append(np.sqrt((frames ** 2).mean(axis=1)).round(6).tolist())
            else:
                energies.append([])
            durs.append(len(samples) / rate)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "frame_energy": pa.array(energies, type=pa.list_(pa.float64())),
            "duration_sec": pa.array(durs, type=pa.float64()),
        })


class VideoFrameSampleStage:
    """Actor-pool stage: sample every k-th frame, emit as image rows
    (flat_map-style: one output row per sampled frame)."""

    def __init__(self, every_k: int = 5, video_col: str = "video",
                 id_col: str = "id"):
        self.every_k = every_k
        self.video_col, self.id_col = video_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        out_id, out_frame_no, out_img = [], [], []
        for vid_id, blob in zip(ids, batch.column(self.video_col).to_pylist()):
            if blob is None:
                continue
            frames = decode_video_auto(blob)
            for fi in range(0, frames.shape[0], self.every_k):
                out_id.append(vid_id)
                out_frame_no.append(fi)
                out_img.append(encode_fake_image(frames[fi]))
        return pa.table({
            self.id_col: pa.array(out_id, type=pa.int64()),
            "frame_no": pa.array(out_frame_no, type=pa.int32()),
            "image": pa.array(out_img, type=pa.binary()),
        })


# -- perceptual-hash image dedup --------------------------------------------

def _dct2(a: np.ndarray) -> np.ndarray:
    """2-D DCT-II (numpy-only, Makhoul's FFT construction — standard
    public algorithm; scipy is absent in this environment)."""
    def dct1(x: np.ndarray, axis: int) -> np.ndarray:
        n = x.shape[axis]
        even = x.take(np.arange(0, n, 2), axis)
        odd = x.take(np.arange(1, n, 2)[::-1], axis)
        v = np.concatenate([even, odd], axis=axis)
        V = np.fft.fft(v, axis=axis)
        k = np.arange(n)
        factor = 2.0 * np.exp(-1j * np.pi * k / (2 * n))
        shape = [1] * x.ndim
        shape[axis] = n
        return np.real(V * factor.reshape(shape))

    return dct1(dct1(a.astype(np.float64), 0), 1)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash (classic pHash recipe): resize to 32×32,
    2-D DCT, keep the 8×8 low-frequency block, threshold each
    coefficient at the block median. Robust to resizing, small noise
    and brightness shifts; Hamming distance ≈ perceptual distance."""
    small = _resize_nearest(img, 32, 32)
    low = _dct2(small)[:8, :8].ravel()
    med = np.median(low)
    bits = (low > med).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class ImagePhashStage:
    """Actor-pool stage: decode → pHash block-bucket rows, feeding the
    generic fingerprint_near_dups machinery (pipelines/dedup.py)."""

    def __init__(self, image_col: str = "image", id_col: str = "id",
                 bucket_partitions: int = 64):
        self.image_col, self.id_col = image_col, id_col
        self.bucket_partitions = bucket_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tanml_ray.pipelines.dedup import explode_fp_blocks

        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        keep, fps = [], []
        for i, blob in enumerate(batch.column(self.image_col).to_pylist()):
            if blob is None:
                continue
            keep.append(int(ids[i]))
            fps.append(phash64(decode_image_auto(blob)))
        return explode_fp_blocks(np.asarray(keep, dtype=np.int64),
                                 np.asarray(fps, dtype=np.uint64),
                                 self.bucket_partitions)


def image_near_dups(ds, max_hamming: int = 6, image_col: str = "image",
                    id_col: str = "id", concurrency: int = 2,
                    batch_size: int = 256,
                    as_dataset: bool = False) -> pa.Table:
    """Distributed image near-dup pairs: pHash per image in an
    actor-pool stage (small batch_size — each decoded row is w·h bytes
    on the heap), then the same coarse-bucket + vectorized-Hamming
    candidate machinery text SimHash uses. Returns
    (id_a, id_b, hamming), id_a < id_b, sorted."""
    from tanml_ray.pipelines.dedup import fingerprint_near_dups

    buckets = ds.map_batches(
        ImagePhashStage,
        fn_constructor_kwargs={"image_col": image_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return fingerprint_near_dups(buckets, max_hamming=max_hamming,
                             as_dataset=as_dataset)


# -- audio fingerprint dedup ------------------------------------------------

def audio_fingerprint64(samples: np.ndarray, frame: int = 1024) -> int:
    """64-bit audio fingerprint: frame RMS energies → sign of
    consecutive energy deltas over 64 log-spaced checkpoints (a
    miniature energy-contour fingerprint — robust to gain changes,
    since only the CONTOUR's direction enters the hash)."""
    s = samples.astype(np.float64)
    n = (len(s) // frame) * frame
    if n == 0:
        return 0
    e = np.sqrt((s[:n].reshape(-1, frame) ** 2).mean(axis=1))
    if e.size < 2:
        return 0
    # 65 interpolated checkpoints over the energy contour → 64 delta
    # signs (interpolation, not index sampling: short clips would
    # otherwise repeat checkpoints and bias half the bits to 0)
    c = np.interp(np.linspace(0.0, e.size - 1.0, 65),
                  np.arange(e.size, dtype=np.float64), e)
    bits = (np.diff(c) > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class AudioFingerprintStage:
    """Actor-pool stage: decode fake audio → fingerprint block-bucket
    rows for fingerprint_near_dups."""

    def __init__(self, audio_col: str = "audio", id_col: str = "id",
                 frame: int = 1024, bucket_partitions: int = 64):
        self.audio_col, self.id_col = audio_col, id_col
        self.frame = frame
        self.bucket_partitions = bucket_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tanml_ray.pipelines.dedup import explode_fp_blocks

        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        keep, fps = [], []
        for i, blob in enumerate(batch.column(self.audio_col).to_pylist()):
            if blob is None:
                continue
            _, samples = decode_audio_auto(blob)
            if len(samples) < 2 * self.frame:
                # too short for an energy contour — the degenerate
                # fingerprint 0 would make every short clip a
                # "duplicate" of every other; skip instead
                continue
            keep.append(int(ids[i]))
            fps.append(audio_fingerprint64(samples, self.frame))
        return explode_fp_blocks(np.asarray(keep, dtype=np.int64),
                                 np.asarray(fps, dtype=np.uint64),
                                 self.bucket_partitions)


class VideoFingerprintStage:
    """Actor-pool stage: decode video → sample every k-th frame →
    pHash each sampled frame → 64-bit video fingerprint = Charikar
    SimHash over the frame pHashes (per-bit majority across frames:
    robust to a few edited/reordered frames, unlike hashing the
    concatenated bytes). Emits the generic fingerprint block-bucket
    rows — same downstream machinery as text SimHash / image pHash."""

    def __init__(self, every_k: int = 5, video_col: str = "video",
                 id_col: str = "id", bucket_partitions: int = 64):
        self.every_k = every_k
        self.video_col, self.id_col = video_col, id_col
        self.bucket_partitions = bucket_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tanml_ray.pipelines.dedup import explode_fp_blocks, simhash64

        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        keep, fps = [], []
        for i, blob in enumerate(batch.column(self.video_col).to_pylist()):
            if blob is None:
                continue
            frames = decode_video_auto(blob)
            fhashes = np.array(
                [phash64(frames[fi])
                 for fi in range(0, frames.shape[0], self.every_k)],
                dtype=np.uint64)
            if fhashes.size == 0:
                continue
            keep.append(int(ids[i]))
            fps.append(simhash64(fhashes))
        return explode_fp_blocks(np.asarray(keep, dtype=np.int64),
                                 np.asarray(fps, dtype=np.uint64),
                                 self.bucket_partitions)


def video_near_dups(ds, max_hamming: int = 6, every_k: int = 5,
                    video_col: str = "video", id_col: str = "id",
                    concurrency: int = 2, batch_size: int = 64,
                    as_dataset: bool = False) -> pa.Table:
    """Distributed video near-dup pairs: frame-sampled pHash SimHash
    per video in an actor-pool stage (small batch_size — each decoded
    row is n_frames·w·h bytes on the heap), then the shared
    fingerprint candidate machinery. Returns (id_a, id_b, hamming)."""
    from tanml_ray.pipelines.dedup import fingerprint_near_dups

    buckets = ds.map_batches(
        VideoFingerprintStage,
        fn_constructor_kwargs={"every_k": every_k, "video_col": video_col,
                               "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return fingerprint_near_dups(buckets, max_hamming=max_hamming,
                                 as_dataset=as_dataset)


def audio_near_dups(ds, max_hamming: int = 6, audio_col: str = "audio",
                    id_col: str = "id", concurrency: int = 2,
                    batch_size: int = 256,
                    as_dataset: bool = False) -> pa.Table:
    """Distributed audio near-dup pairs via the shared fingerprint
    candidate machinery (same shape as image_near_dups)."""
    from tanml_ray.pipelines.dedup import fingerprint_near_dups

    buckets = ds.map_batches(
        AudioFingerprintStage,
        fn_constructor_kwargs={"audio_col": audio_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return fingerprint_near_dups(buckets, max_hamming=max_hamming,
                             as_dataset=as_dataset)
