"""Real multimodal codecs: PNG images and WAV audio, stdlib + numpy.

This container ships no media libraries (no PIL/ffmpeg/soundfile), but
two production formats are decodable with what IS here: PNG is zlib
(stdlib) over per-row filtered scanlines, and WAV is stdlib ``wave``.
So the multimodal decode seam (operators/multimodal.py) gets REAL
decoders for those formats — actual byte-format parsing, verified
cross-engine by the ``image_feats``/``audio_feats`` gate queries whose
DuckDB oracles replay the pixel/sample arithmetic from first
principles. JPEG/MP4/etc. remain behind the documented deterministic
fake (honest capability limit).

Decode cost model: these run inside the Arrow batch loop of
``decode_image_features`` (per-row Python — the same deliberate
ingest-boundary exception as the WARC/shapefile/Avro parsers). The
unfilter loop is numpy-per-row; filters 3/4 (Average/Paeth) fall back
to a per-byte loop because their intra-row serial dependence cannot
vectorize — our encoder emits filter 0, and corpus-scale PNG decode
would vendor a C codec through the same seam.

PNG subset: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
gray+alpha, RGBA), codecs as per spec, CRC-verified, non-interlaced
(Adam7 raises). WAV subset: PCM 16-bit, any rate/channels.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "decode_png", "encode_png", "decode_wav", "encode_wav",
    "decode_avi", "encode_avi", "avi_frame_decoder",
    "block_mean_luminance", "png_decoder", "wav_decoder",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ----------------------------------------------------------------- PNG

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (filter 0, gray/GA/RGB/RGBA
    by channel count)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = row
        elif f == 2:  # Up — vectorized
            cur = (row + prev) & 255
        elif f == 1:  # Sub — per-channel prefix sum mod 256
            cols = row.reshape(-1, bpp)
            cur = (np.cumsum(cols, axis=0) & 255).reshape(-1)
        elif f == 3:  # Average — serial in a
            cur = row
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth — serial in a/c
            cur = row
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 255
        else:
            raise ValueError(f"png: unknown filter {f} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8. CRC-verified; unsupported
    shapes raise (never a silent wrong answer)."""
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    pos = 8
    idat, plte, hdr = [], None, None
    while pos < len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(buf[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {typ!r}")
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if depth != 8:
        raise NotImplementedError(f"png: bit depth {depth} (8 only)")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"png: color type {ctype}")
    if comp != 0 or filt != 0:
        raise ValueError("png: bad compression/filter method")
    if interlace != 0:
        raise NotImplementedError("png: Adam7 interlace")
    bpp = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("png: IDAT length mismatch")
    img = _unfilter(raw, h, stride, bpp).reshape(h, w, bpp)
    if ctype == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        img = plte[img[:, :, 0]]
    return img


# ----------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV (PCM 16-bit) bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes):
    """WAV bytes -> (rate, (n, channels) int16 ndarray). PCM 16-bit only."""
    with wave.open(io.BytesIO(bytes(buf)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"wav: sample width {w.getsampwidth()} (16-bit PCM only)")
        ch = w.getnchannels()
        data = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    return w.getframerate(), data.reshape(-1, ch)


# ----------------------------------------------------------------- AVI

def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def encode_avi(frames, fps: int = 10) -> bytes:
    """list of (h, w, 3) uint8 RGB frames -> uncompressed AVI (BI_RGB:
    bottom-up rows, BGR byte order, 4-byte row stride padding — the DIB
    layout every AVI tool writes for raw video)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    framebuf = []
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("avi: all frames must share (h, w, 3)")
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # flip+BGR
        framebuf.append(rows.tobytes())
    frame_bytes = stride * h
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
                       len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, len(frames), frame_bytes, 0xFFFFFFFF, 0, 0))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(_riff_chunk(b"strh", strh))
        + len(_riff_chunk(b"strf", strf))) + b"strl" \
        + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    hdrl_body = _riff_chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" \
        + hdrl_body
    movi_body = b"".join(_riff_chunk(b"00db", fb) for fb in framebuf)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" \
        + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(buf: bytes):
    """AVI bytes -> (fps, [(h, w, 3) uint8 RGB frames]). Uncompressed
    BI_RGB 24-bit video only; compressed streams raise."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI file")
    w = h = None
    rate = scale = None
    in_vids = False
    frames = []

    def walk(pos, end):
        nonlocal w, h, rate, scale, in_vids
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            ln = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(data_start + 4, data_start + ln)
            elif fourcc == b"strh":
                typ = buf[data_start:data_start + 4]
                in_vids = typ == b"vids"
                if in_vids:
                    scale, rate = struct.unpack(
                        "<II", buf[data_start + 20:data_start + 28])
            elif fourcc == b"strf" and in_vids and w is None:
                (_sz, bw, bh, _planes, bits, comp) = struct.unpack(
                    "<IiiHHI", buf[data_start:data_start + 20])
                if comp != 0 or bits != 24:
                    raise NotImplementedError(
                        f"avi: compression {comp} / {bits}-bit "
                        "(BI_RGB 24-bit only)")
                if bh < 0:
                    raise NotImplementedError(
                        "avi: top-down DIB (negative biHeight)")
                w, h = bw, bh
            elif fourcc[2:4] in (b"db", b"dc") and fourcc[:2].isdigit():
                if w is None:
                    raise ValueError("avi: frame chunk before strf header")
                stride = (w * 3 + 3) & ~3
                if ln != stride * h:
                    raise ValueError("avi: frame size mismatch")
                rows = np.frombuffer(buf, np.uint8, stride * h,
                                     data_start).reshape(h, stride)
                frames.append(
                    rows[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy())
            pos = data_start + ln + (ln & 1)

    walk(12, len(buf))
    if not frames:
        raise ValueError("avi: no video frames found")
    fps = rate // scale if rate and scale else 0
    return fps, frames


def avi_frame_decoder(every_ms: int = 1000):
    """REAL video decoder for sample_video_frames: AVI bytes +
    duration_ms -> [(frame_idx, png_bytes)] sampled one frame per
    ``every_ms`` (floor(t_ms * fps / 1000) index rule, first frame at
    t=0). Sampled frames re-encode as PNG so downstream image stages
    (decode_image_features + png_decoder) compose directly."""

    def decode(b: bytes, duration_ms: int):
        fps, frames = decode_avi(b)
        if fps <= 0:
            raise ValueError("avi: missing frame rate")
        out = []
        t = 0
        while t < max(int(duration_ms), 1):
            idx = min(t * fps // 1000, len(frames) - 1)
            out.append((int(idx), encode_png(frames[idx])))
            t += every_ms
        return out

    return decode


# ------------------------------------------------------------- features

# integer luminance weights (ITU-R 601 x1000) — exact int arithmetic
# until the single final division, so the oracle can replay bit-for-bit
_LUM_W = (299, 587, 114)


def block_mean_luminance(img: np.ndarray, grid: int = 8) -> list:
    """(h, w, c) uint8 -> grid*grid luminance block means, row-major by
    (block_y, block_x). Luminance = (299 r + 587 g + 114 b) for RGB(A),
    1000 * v for gray(+alpha); each feature = int block sum / (1000 *
    block_px) — ONE double division per feature, deterministic order.
    Dims not divisible by ``grid`` crop to the largest divisible region
    (resize-by-area-pool in one step)."""
    h, w, c = img.shape
    if h < grid or w < grid:
        raise ValueError(f"png: image {h}x{w} smaller than grid {grid}")
    px = img.astype(np.int64)
    if c >= 3:
        lum = px[:, :, 0] * _LUM_W[0] + px[:, :, 1] * _LUM_W[1] \
            + px[:, :, 2] * _LUM_W[2]
    else:
        lum = px[:, :, 0] * 1000
    bh, bw = h // grid, w // grid
    lum = lum[:bh * grid, :bw * grid]
    sums = lum.reshape(grid, bh, grid, bw).sum(axis=(1, 3))
    return (sums / float(1000 * bh * bw)).reshape(-1).tolist()


def png_decoder(grid: int = 8):
    """REAL image decoder for decode_image_features: PNG bytes ->
    grid*grid luminance block-mean feature vector."""

    def decode(b: bytes):
        return block_mean_luminance(decode_png(b), grid)

    return decode


def wav_decoder(n_windows: int = 8):
    """REAL audio decoder for decode_image_features-style seams: WAV
    bytes -> per-window [mean |amplitude|, zero crossings] features
    (2 * n_windows values; first channel). Mean-abs = int sum / window
    length (one double division); zero crossings = count of strict sign
    products < 0 between consecutive samples — exact integers, so the
    whole vector is engine-replayable."""

    def decode(b: bytes):
        _, samples = decode_wav(b)
        s = samples[:, 0].astype(np.int64)
        L = len(s) // n_windows
        if L < 2:
            raise ValueError(f"wav: too short for {n_windows} windows")
        out = []
        for k in range(n_windows):
            win = s[k * L:(k + 1) * L]
            out.append(float(np.abs(win).sum()) / L)
            out.append(float(np.count_nonzero(win[:-1] * win[1:] < 0)))
        return out

    return decode
