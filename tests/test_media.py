"""Real media codecs (operators/media.py): PNG encode/decode round
trips per color type, all five scanline filters decoded against an
independent reference, CRC/shape guards, WAV round trips, feature
known-answers, and the Spark decode seam end-to-end."""

import struct
import zlib

import numpy as np
import pytest

from geomesa_spark.operators.media import (
    avi_frame_decoder, block_mean_luminance, decode_avi, decode_png,
    decode_wav, encode_avi, encode_png, encode_wav, png_decoder,
    wav_decoder,
)


def _rng(seed):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _rng(channels).randint(0, 256, (23, 17, channels), np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_png_gray_2d_input():
    img = _rng(7).randint(0, 256, (9, 11), np.uint8)
    assert np.array_equal(decode_png(encode_png(img))[:, :, 0], img)


def _png_from_raw(raw, w, h, ctype, plte=None):
    """Wrap a pre-filtered raw scanline stream in PNG chunks."""
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if plte is not None:
        out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(raw))
    out += chunk(b"IEND", b"")
    return out


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def test_png_all_filters_against_reference():
    """Filter the SAME image with every filter type per row and check
    decode against an independent straight-from-the-spec reconstruction."""
    img = _rng(42).randint(0, 256, (5, 7, 3), np.uint8)
    h, w, bpp = img.shape
    stride = w * bpp
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        row = flat[y]
        filt = np.empty(stride, np.int32)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                filt[i] = row[i]
            elif f == 1:
                filt[i] = row[i] - a
            elif f == 2:
                filt[i] = row[i] - b
            elif f == 3:
                filt[i] = row[i] - ((a + b) >> 1)
            else:
                filt[i] = row[i] - _paeth(a, b, c)
        raw.append(f)
        raw += (filt & 255).astype(np.uint8).tobytes()
    back = decode_png(_png_from_raw(bytes(raw), w, h, 2))
    assert np.array_equal(back, img)


def test_png_palette():
    idx = _rng(3).randint(0, 5, (6, 8, 1), np.uint8)
    plte = _rng(4).randint(0, 256, (5, 3), np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    back = decode_png(_png_from_raw(raw, 8, 6, 3, plte=plte))
    assert np.array_equal(back, plte[idx[:, :, 0]])


def test_png_guards():
    img = _rng(1).randint(0, 256, (4, 4, 3), np.uint8)
    buf = bytearray(encode_png(img))
    buf[30] ^= 0xFF  # corrupt inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 32)
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr16) & 0xFFFFFFFF))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(bad)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    s = _rng(9).randint(-32768, 32768, (501, channels)).astype(np.int16)
    rate, back = decode_wav(encode_wav(s, rate=22050))
    assert rate == 22050
    assert np.array_equal(back, s)


def test_wav_mono_1d_and_guard():
    s = np.arange(-100, 100, dtype=np.int16)
    rate, back = decode_wav(encode_wav(s, rate=8000))
    assert np.array_equal(back[:, 0], s)
    # 8-bit PCM must raise, not misdecode
    import io
    import wave
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 10)
    with pytest.raises(NotImplementedError, match="width"):
        decode_wav(bio.getvalue())


def test_avi_roundtrip():
    # w=7 exercises the 4-byte stride padding (7*3=21 -> stride 24)
    frames = [_rng(20 + i).randint(0, 256, (5, 7, 3), np.uint8)
              for i in range(4)]
    fps, back = decode_avi(encode_avi(frames, fps=25))
    assert fps == 25 and len(back) == 4
    for f0, f1 in zip(frames, back):
        assert np.array_equal(f0, f1)


def test_avi_guards():
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"NOPE" + b"\x00" * 64)
    buf = bytearray(encode_avi([np.zeros((4, 4, 3), np.uint8)]))
    # flip biCompression (offset of strf data + 16) to a nonzero codec
    i = bytes(buf).index(b"strf") + 8 + 16
    buf[i] = 1
    with pytest.raises(NotImplementedError, match="compression"):
        decode_avi(bytes(buf))


def test_avi_frame_decoder_sampling():
    frames = [np.full((4, 4, 3), 10 * i, np.uint8) for i in range(10)]
    dec = avi_frame_decoder(every_ms=1000)
    out = dec(encode_avi(frames, fps=5), 2000)  # t = 0ms, 1000ms
    assert [i for i, _ in out] == [0, 5]
    for idx, png in out:
        assert np.array_equal(decode_png(png), frames[idx])


def test_block_mean_known_answer():
    # 4x4 gray, grid 2: each block mean = mean of its 4 pixels
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    feats = block_mean_luminance(img, grid=2)
    # luminance = 1000*v; mean over 2x2 blocks / (1000*4)
    assert feats == [(0 + 1 + 4 + 5) / 4, (2 + 3 + 6 + 7) / 4,
                     (8 + 9 + 12 + 13) / 4, (10 + 11 + 14 + 15) / 4]
    with pytest.raises(ValueError, match="smaller"):
        block_mean_luminance(img, grid=8)


def test_decoders_end_to_end_spark(spark):
    from geomesa_spark.operators.multimodal import decode_image_features

    img = _rng(11).randint(0, 256, (16, 16, 3), np.uint8)
    s = _rng(12).randint(-3000, 3000, 640).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img))), (2, bytearray(encode_wav(s)))],
        "media_id long, content binary")
    feats = decode_image_features(df.filter("media_id = 1"),
                                  decoder=png_decoder(8))
    [row] = feats.collect()
    expect = block_mean_luminance(img, 8)
    assert np.allclose(row["features"], np.float32(expect))
    afeats = decode_image_features(df.filter("media_id = 2"),
                                   decoder=wav_decoder(4))
    [arow] = afeats.collect()
    want = wav_decoder(4)(encode_wav(s))
    assert np.allclose(arow["features"], np.float32(want))
