"""Stdlib real-format codecs for the multimodal stages.

This container has no PIL / soundfile / ffmpeg, but several REAL
interchange formats are decodable with only the standard library and
numpy, which lets the multimodal operators (resize, feature-extract,
pHash/audio-fp/video near-dup — stages/multimodal.py) run end-to-end
on genuine bytes rather than the self-describing fake codec:

  * BMP  (Windows DIB, BITMAPINFOHEADER, uncompressed 8/24/32-bit)
  * PGM / PPM (binary P5 / P6 netpbm)
  * WAV  (RIFF PCM, 8/16-bit, any channel count — stdlib `wave`)
  * AVI  (RIFF 'AVI ', uncompressed 8-bit DIB '00db' frames — the
    canonical raw-video container; reader scans the movi LIST)

Encoders are provided for every format so tests and fixture
generators produce spec-correct files (the BMP/WAV outputs open in
any external viewer/player). All decoders are vectorized numpy over
the raw buffer — no per-pixel Python loops.

Color → grayscale uses integer ITU-R BT.601 luma
(299*R + 587*G + 114*B) // 1000 so results are deterministic across
platforms (no float rounding).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# -- BMP ---------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")      # magic, size, res, res, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)


def _luma(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 RGB → uint8 grayscale, integer BT.601."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def encode_bmp_gray(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale → 8-bit palettized BMP (linear gray
    palette, bottom-up rows padded to 4 bytes). Roundtrips exactly
    through decode_bmp_gray and opens in any image viewer."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = px[::-1]  # bottom-up
    palette = np.zeros((256, 4), dtype=np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256)
    data_off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size + palette.nbytes
    body = rows.tobytes()
    head = _BMP_FILE_HDR.pack(b"BM", data_off + len(body), 0, 0, data_off)
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0)
    return head + info + palette.tobytes() + body


def _decode_dib(info: bytes, buf: bytes, data_off: int) -> np.ndarray:
    """Shared DIB decode for BMP files and AVI '00db' frames.
    `info` is the 40-byte BITMAPINFOHEADER; `buf` starts immediately
    AFTER the info header (so an 8-bit palette sits at offset
    hdr_size-40 within it) with pixel rows at `data_off`."""
    (hdr_size, w, h, _planes, bpp, comp, _img_size,
     _xppm, _yppm, clr_used, _clr_imp) = _BMP_INFO_HDR.unpack(info[:40])
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp} (BI_RGB only)")
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        n_colors = clr_used or 256
        pal = np.frombuffer(buf, dtype=np.uint8, count=n_colors * 4,
                            offset=hdr_size - 40).reshape(n_colors, 4)
        # palette entries are BGRA
        pal_gray = _luma(pal[:, [2, 1, 0]])
        stride = (w + 3) & ~3
        rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride,
                             offset=data_off).reshape(h, stride)
        img = pal_gray[rows[:, :w]]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride,
                             offset=data_off).reshape(h, stride)
        bgr = rows[:, : w * nb].reshape(h, w, nb)
        img = _luma(bgr[..., [2, 1, 0]])
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return img if top_down else img[::-1].copy()


def decode_bmp_gray(blob: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, uncompressed 8/24/32-bit) → uint8 (h, w)
    grayscale. 8-bit goes through its palette; color uses BT.601."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, data_off = _BMP_FILE_HDR.unpack_from(blob, 0)
    body_start = _BMP_FILE_HDR.size + 40
    return _decode_dib(blob[_BMP_FILE_HDR.size:body_start],
                       blob[body_start:], data_off - body_start)


# -- PGM / PPM (binary netpbm) ------------------------------------------------

def encode_pgm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_ppm(rgb: np.ndarray) -> bytes:
    px = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def _pnm_header(blob: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse 'P5'/'P6' + whitespace/comment-separated w h maxval;
    returns (magic, w, h, maxval, data_offset)."""
    magic = blob[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and '#' comments
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            nl = blob.index(b"\n", pos)
            pos = nl + 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(blob[start:pos]))
    return magic, vals[0], vals[1], vals[2], pos + 1  # single WS after maxval


def decode_pnm_gray(blob: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6) → uint8 (h, w) grayscale."""
    magic, w, h, maxval, off = _pnm_header(blob)
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    if magic == b"P5":
        return np.frombuffer(blob, dtype=np.uint8, count=w * h,
                             offset=off).reshape(h, w).copy()
    if magic == b"P6":
        rgb = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3,
                            offset=off).reshape(h, w, 3)
        return _luma(rgb)
    raise ValueError("not a binary PGM/PPM payload")


# -- WAV (stdlib wave) --------------------------------------------------------

def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF PCM WAV bytes (plays anywhere)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF PCM WAV → (sample_rate, int16 mono samples). Multi-channel
    input is averaged to mono; 8-bit PCM (unsigned) is rescaled to
    int16 range. Decoded once per blob with stdlib `wave` — no
    external audio library."""
    with wave.open(io.BytesIO(blob), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        samples = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                    - 128) << 8).astype(np.int16)
    else:
        raise ValueError(f"unsupported WAV sample width {width} bytes "
                         "(PCM 8/16-bit only)")
    if nch > 1:
        samples = (samples.reshape(-1, nch).astype(np.int32)
                   .mean(axis=1)).astype(np.int16)
    return rate, samples


# -- AVI (uncompressed 8-bit DIB frames) --------------------------------------

def encode_avi_gray(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 (n, h, w) grayscale frames → minimal spec-correct RIFF
    AVI: hdrl (avih + one 'vids' strl with an 8-bit BITMAPINFOHEADER
    + gray palette), movi LIST of '00db' DIB frames, idx1 index.
    Uncompressed 8-bit DIB is the raw-video baseline every AVI reader
    handles."""
    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w = fr.shape
    stride = (w + 3) & ~3
    frame_size = h * stride

    def _dib(frame: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = frame[::-1]
        return rows.tobytes()

    palette = np.zeros((256, 4), dtype=np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256)

    avih = struct.pack("<IIIIIIIIIIIIII",
                       10 ** 6 // fps, frame_size * fps, 0, 0x10,  # HASINDEX
                       n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh",
                       b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
                       frame_size, 0, 0, 0, 0, w, h)
    strf = _BMP_INFO_HDR.pack(40, w, h, 1, 8, 0, frame_size, 0, 0, 256, 0) \
        + palette.tobytes()

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00db", _dib(fr[i])) for i in range(n))
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to 'movi' fourcc
    idx_entries, off = [], 4
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off,
                                       frame_size))
        off += 8 + frame_size + (frame_size & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_gray(blob: bytes) -> np.ndarray:
    """Minimal AVI reader: locate the stream's BITMAPINFOHEADER in
    hdrl, then decode every '00db' DIB chunk in the movi LIST.
    Handles the subset encode_avi_gray writes (and any uncompressed
    8/24/32-bit-DIB AVI): returns uint8 (n, h, w) grayscale."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    pos, end = 12, 8 + struct.unpack("<I", blob[4:8])[0]
    strf: bytes | None = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal strf
        while pos + 8 <= end:
            fourcc = blob[pos:pos + 4]
            (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"strf" and strf is None:
                strf = blob[body_start:body_start + size]
            elif fourcc in (b"00db", b"00dc") and size:
                if strf is None:
                    raise ValueError("AVI movi chunk before strf header")
                # splice (palette from strf) + (pixel rows from the
                # movi chunk) into one buffer for the shared DIB path
                frames.append(_decode_dib(
                    strf[:40], strf[40:] + blob[body_start:body_start + size],
                    len(strf) - 40))
            pos = body_start + size + (size & 1)

    walk(pos, end)
    if not frames:
        raise ValueError("AVI contains no decodable 00db/00dc frames")
    return np.stack(frames)
