"""Hypothesis property tests for the media codecs: encode→decode is the
identity for every supported shape/value, including the PNG filter paths
(exercised via a seed-chosen filter per scanline on hand-built files)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from linked_maps_spark import codecs
from tests.test_codecs import _apply_png_filter


def _img(draw, max_side=12, channels=(3,)):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ch = draw(st.sampled_from(channels))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_bmp_roundtrip_property(data):
    img = _img(data.draw)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_png_roundtrip_property(data):
    img = _img(data.draw, channels=(1, 2, 3, 4))
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_png_unfilter_property_mixed_filters(data):
    """Build a PNG whose scanlines use a hypothesis-chosen mix of all five
    filters (via the spec-reference forward filter) — decode must invert."""
    img = _img(data.draw, max_side=8, channels=(1, 3, 4))
    h, w, nch = img.shape
    flat = img.reshape(h, w * nch)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    lines = []
    for r in range(h):
        prev = flat[r - 1] if r else np.zeros(w * nch, dtype=np.uint8)
        if filters[r] == 0:
            body = flat[r].tobytes()
        else:
            body = _apply_png_filter(filters[r], flat[r], prev, nch).tobytes()
        lines.append(bytes([filters[r]]) + body)
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    payload = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(payload), img)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_ppm_stream_roundtrip_property(data):
    n = data.draw(st.integers(1, 4))
    frames = [_img(data.draw, max_side=6) for _ in range(n)]
    out = codecs.decode_ppm_stream(codecs.encode_ppm_stream(frames))
    assert len(out) == n and all(np.array_equal(a, b) for a, b in zip(frames, out))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 200),
    st.integers(1, 3),
    st.integers(1000, 96000),
    st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    got_rate, out = codecs.decode_wav(codecs.encode_wav(rate, s))
    assert got_rate == rate and np.array_equal(out, s)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_resize_nearest_values_come_from_source(data):
    """Every output pixel of nearest-resize equals the mapped source pixel."""
    img = _img(data.draw, max_side=9)
    W = data.draw(st.integers(1, 12))
    H = data.draw(st.integers(1, 12))
    out = codecs.resize_nearest(img, W, H)
    h, w = img.shape[:2]
    for y in range(H):
        for x in range(W):
            sy = min(int((y + 0.5) * h / H), h - 1)
            sx = min(int((x + 0.5) * w / W), w - 1)
            assert np.array_equal(out[y, x], img[sy, sx])


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_resize_bilinear_bounds_and_identity(data):
    """Bilinear output stays within the source value range; same-size
    resize is the identity (half-pixel centers map exactly)."""
    img = _img(data.draw, max_side=9)
    W = data.draw(st.integers(1, 12))
    H = data.draw(st.integers(1, 12))
    out = codecs.resize_bilinear(img, W, H)
    assert out.shape == (H, W, img.shape[2])
    assert out.min() >= img.min() and out.max() <= img.max()
    assert np.array_equal(
        codecs.resize_bilinear(img, img.shape[1], img.shape[0]), img
    )
