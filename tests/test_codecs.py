"""Spec-conformance tests for the pure-numpy media codecs (no Spark).

Round-trips, hand-built headers for the decode-only paths (32-bit BMP,
PNG filters 1-4, WAV with foreign chunks), resize kernels, and the
deterministic feature extractors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from linked_maps_spark import codecs


def _rng_img(h, w, ch=3, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8) if ch else rng.randint(
        0, 256, size=(h, w), dtype=np.uint8
    )


# ---------------------------------------------------------------- BMP

def test_bmp_roundtrip_with_row_padding():
    img = _rng_img(5, 3)  # stride 3*3=9 → padded to 12
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_bmp_32bit_topdown_decode():
    img = _rng_img(4, 2)
    h, w = img.shape[:2]
    bgrx = np.zeros((h, w, 4), dtype=np.uint8)
    bgrx[:, :, :3] = img[:, :, ::-1]
    data = bgrx.tobytes()  # top-down: negative height, no padding at 32bpp
    off = 14 + 40
    payload = (
        struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data), 0, 0, 0, 0)
        + data
    )
    assert np.array_equal(codecs.decode_bmp(payload), img)


def test_bmp_rejects_compressed():
    img = _rng_img(2, 2)
    raw = bytearray(codecs.encode_bmp(img))
    struct.pack_into("<I", raw, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        codecs.decode_bmp(bytes(raw))


# ---------------------------------------------------------------- PNG

@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_channels(ch):
    img = _rng_img(6, 5, ch)
    out = codecs.decode_png(codecs.encode_png(img))
    assert np.array_equal(out, img)


def test_png_grey_2d_input():
    img = _rng_img(4, 4, 0)
    out = codecs.decode_png(codecs.encode_png(img))
    assert np.array_equal(out[:, :, 0], img)


def _apply_png_filter(ftype, cur, prev, bpp):
    """Reference forward filter (PNG spec §9) to build decode-only fixtures."""
    n = cur.size
    out = np.zeros(n, dtype=np.uint8)
    for x in range(n):
        left = int(cur[x - bpp]) if x >= bpp else 0
        up = int(prev[x])
        ul = int(prev[x - bpp]) if x >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = codecs._paeth(left, up, ul)
        out[x] = (int(cur[x]) - pred) & 0xFF
    return out


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decode_each_filter(ftype):
    img = _rng_img(5, 4, 3, seed=ftype)
    h, w, nch = img.shape
    flat = img.reshape(h, w * nch)
    lines = []
    for r in range(h):
        prev = flat[r - 1] if r else np.zeros(w * nch, dtype=np.uint8)
        lines.append(bytes([ftype]) + _apply_png_filter(ftype, flat[r], prev, nch).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(payload), img)


def test_png_crc_checked():
    raw = bytearray(codecs.encode_png(_rng_img(2, 2)))
    raw[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(raw))


# ---------------------------------------------------------------- netpbm

def test_ppm_roundtrip_and_comment():
    img = _rng_img(3, 4)
    enc = codecs.encode_ppm(img)
    assert np.array_equal(codecs.decode_pnm(enc), img)
    commented = b"P6\n# a comment\n4 3\n# another\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_pnm(commented), img)


def test_pgm_decode():
    img = _rng_img(3, 4, 0)
    payload = b"P5\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_pnm(payload)[:, :, 0], img)


def test_ppm_stream_roundtrip():
    frames = [_rng_img(3, 3, seed=s) for s in range(4)]
    out = codecs.decode_ppm_stream(codecs.encode_ppm_stream(frames))
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


# ---------------------------------------------------------------- WAV

def test_wav_roundtrip_stereo():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, size=(100, 2)).astype(np.int16)
    rate, out = codecs.decode_wav(codecs.encode_wav(22050, s))
    assert rate == 22050
    assert np.array_equal(out, s)


def test_wav_tolerates_foreign_chunks():
    s = np.arange(-5, 6, dtype=np.int16)
    enc = codecs.encode_wav(8000, s)
    # splice an odd-length LIST chunk between fmt and data
    fmt_end = enc.index(b"data")
    foreign = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # word-aligned pad
    spliced = enc[:fmt_end] + foreign + enc[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, out = codecs.decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out[:, 0], s)


# ---------------------------------------------------------------- resize

def test_resize_nearest_2x():
    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)[:, :, None]
    out = codecs.resize_nearest(img, 4, 4)[:, :, 0]
    assert np.array_equal(
        out, np.array([[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]])
    )


def test_resize_bilinear_constant_and_identity():
    img = np.full((5, 7, 3), 99, dtype=np.uint8)
    assert np.array_equal(codecs.resize_bilinear(img, 13, 3), np.full((3, 13, 3), 99))
    rimg = _rng_img(6, 6)
    assert np.array_equal(codecs.resize_bilinear(rimg, 6, 6), rimg)


def test_resize_bilinear_ramp_midpoint():
    img = np.array([[0, 100]], dtype=np.uint8)
    out = codecs.resize_bilinear(img, 4, 1)
    # centers at src x = -0.25, 0.25, 0.75, 1.25 → clamped 0, 25, 75, 100
    assert out.tolist() == [[0, 25, 75, 100]]


# ---------------------------------------------------------------- sniff / features

def test_sniff():
    img = _rng_img(2, 2)
    assert codecs.sniff(codecs.encode_bmp(img)) == "image/bmp"
    assert codecs.sniff(codecs.encode_png(img)) == "image/png"
    assert codecs.sniff(codecs.encode_ppm(img)) == "image/x-portable-pixmap"
    assert codecs.sniff(codecs.encode_wav(8000, np.zeros(4, np.int16))) == "audio/wav"
    assert codecs.sniff(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
    assert codecs.sniff(b"garbage") is None


def test_image_features_constant():
    img = np.full((4, 4, 3), 100, dtype=np.uint8)
    f = codecs.image_features(img)
    assert f[:3].tolist() == [4, 4, 3]
    assert np.allclose(f[3:6], 100) and np.allclose(f[6:9], 0)
    assert np.isclose(f[9:].sum(), 1.0) and f[9 + 3] == 1.0  # luma ~100 → bin 3


def test_audio_features_sine():
    rate, f0, n = 8000, 440.0, 8000
    t = np.arange(n) / rate
    s = (np.sin(2 * np.pi * f0 * t) * 20000).astype(np.int16)
    f = codecs.audio_features(rate, s)
    assert f[0] == n and f[1] == rate and f[2] == 1
    assert abs(f[3] - 20000 / 32768 / np.sqrt(2)) < 0.01  # sine RMS
    assert abs(f[4] - 2 * f0) < 5  # two zero crossings per cycle
    assert abs(f[5] - f0) < 10  # spectral centroid at the tone
