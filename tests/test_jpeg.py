"""Tests for the pure-numpy baseline JPEG codec (linked_maps_spark.jpeg).

JPEG is lossy, so the exactness tests use the DC-only closed form
(greyscale constant 8x8 blocks at quality 50 — see the module docstring),
and the lossy paths assert tight error bounds on smooth images plus
byte-determinism of the encoder.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from linked_maps_spark import jpeg


def _closed_form(v: int) -> int:
    """Expected decoded value of a constant-v block at quality 50."""
    d = v - 128
    if d >= 0:
        return min(128 + 2 * ((d + 1) // 2), 255)
    return max(128 - 2 * ((-d + 1) // 2), 0)


def _blocks_img(vals: np.ndarray) -> np.ndarray:
    """(hb, wb) block values -> (8*hb, 8*wb) uint8 image of constant blocks."""
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_constant_block_closed_form_exact():
    vals = (np.arange(12).reshape(3, 4) * 37 + 5) % 256
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(_blocks_img(vals), quality=50))[:, :, 0]
    for by in range(3):
        for bx in range(4):
            blk = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == _closed_form(int(vals[by, bx]))).all()


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_constant_block_closed_form_property(data):
    hb = data.draw(st.integers(1, 4))
    wb = data.draw(st.integers(1, 4))
    vals = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=hb * wb, max_size=hb * wb
            )
        )
    ).reshape(hb, wb)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(_blocks_img(vals), quality=50))[:, :, 0]
    expect = np.vectorize(_closed_form)(vals)
    got = dec.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(hb, wb, 64)
    assert (got == expect[:, :, None]).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 20), st.integers(1, 20))
def test_quality100_roundtrip_tight(seed, h, w):
    """At quality 100 every quantizer is 1: error is DCT rounding only."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))[:, :, 0]
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_smooth_grey_q90_maxerr_small():
    g = np.clip(
        np.fromfunction(lambda y, x: 80 + 0.5 * x + 0.3 * y, (40, 56)), 0, 255
    ).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))[:, :, 0]
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


@pytest.mark.parametrize("sub", ["444", "420"])
def test_smooth_color_roundtrip(sub):
    cc = np.stack(
        [
            np.clip(
                np.fromfunction(lambda y, x: a + 0.4 * x + 0.2 * y, (30, 42)),
                0,
                255,
            )
            for a in (60, 100, 140)
        ],
        axis=2,
    ).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(cc, quality=95, subsampling=sub))
    assert dec.shape == cc.shape
    assert np.abs(dec.astype(int) - cc.astype(int)).max() <= 3


def test_noise_color_444_bounded():
    rng = np.random.default_rng(11)
    c = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(c, quality=95, subsampling="444"))
    err = np.abs(dec.astype(int) - c.astype(int))
    assert err.max() <= 64 and err.mean() <= 8


@pytest.mark.parametrize("shape", [(1, 1), (7, 3), (9, 17), (16, 16)])
def test_odd_sizes_and_grey_channel(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92))
    assert dec.shape == (*shape, 1)
    # (h, w, 1) input is accepted identically
    dec2 = jpeg.decode_jpeg(jpeg.encode_jpeg(img[:, :, None], quality=92))
    assert (dec == dec2).all()


def test_encoder_deterministic():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert jpeg.encode_jpeg(img, 80, "420") == jpeg.encode_jpeg(img, 80, "420")


def test_restart_markers_roundtrip():
    """DRI/RSTn path: byte-aligned segments, DC predictors reset."""
    vals = (np.arange(24).reshape(4, 6) * 53 + 9) % 256
    img = _blocks_img(vals)
    enc = jpeg.encode_jpeg(img, quality=50, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI present
    assert b"\xff\xd0" in enc  # at least one RST0
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=50))
    assert (jpeg.decode_jpeg(enc) == plain).all()


def test_restart_markers_color():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    enc = jpeg.encode_jpeg(img, quality=85, subsampling="420", restart_interval=1)
    plain = jpeg.encode_jpeg(img, quality=85, subsampling="420")
    assert (jpeg.decode_jpeg(enc) == jpeg.decode_jpeg(plain)).all()


def test_lossless_arithmetic_raise():
    # SOI + minimal SOF3 (lossless) header: still honestly rejected
    sof3 = b"\xff\xc3" + b"\x00\x0b" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(b"\xff\xd8" + sof3 + b"\xff\xd9")


# ---------------------------------------------------------------------------
# progressive (SOF2): round 5 — decode(progressive) must equal
# decode(baseline) PIXEL-EXACTLY, because both entropy-code the same
# quantized coefficients; any divergence is a codec bug, not loss.


def _prog_cases():
    rng = np.random.default_rng(5)
    grad = (np.indices((24, 17)).sum(0) * 3 % 256).astype(np.uint8)
    return [
        (rng.integers(0, 256, size=(16, 16), dtype=np.uint8), None),
        (rng.integers(0, 256, size=(24, 17), dtype=np.uint8), None),  # odd dims
        (grad, None),
        (rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8), "444"),
        (rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8), "420"),
        (np.stack([grad, np.roll(grad, 5, 0), np.roll(grad, 9, 1)], axis=2), "420"),
        (np.full((8, 8), 200, dtype=np.uint8), None),
    ]


@pytest.mark.parametrize("quality", [30, 50, 75, 95])
def test_progressive_equals_baseline_decode(quality):
    for img, sub in _prog_cases():
        kw = {} if sub is None else {"subsampling": sub}
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality, **kw))
        prog = jpeg.decode_jpeg(
            jpeg.encode_progressive_jpeg(img, quality=quality, **kw)
        )
        assert np.array_equal(base, prog), (img.shape, sub, quality)


def test_progressive_stream_is_multi_scan_sof2():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    enc = jpeg.encode_progressive_jpeg(img, quality=75)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    assert enc.count(b"\xff\xda") == 6  # grey scan script: 6 scans
    # refinement really participates: truncating to the first-approximation
    # scans (drop the Al=0 refinements) must change the decode
    third_sos = [i for i in range(len(enc)) if enc[i : i + 2] == b"\xff\xda"][3]
    partial = enc[:third_sos] + b"\xff\xd9"
    coarse = jpeg.decode_jpeg(partial)
    full = jpeg.decode_jpeg(enc)
    assert coarse.shape == full.shape
    assert not np.array_equal(coarse, full)


def test_progressive_constant_block_closed_form():
    # DC-only images survive the successive-approximation split exactly
    vals = (np.arange(12).reshape(3, 4) * 37 + 5) % 256
    dec = jpeg.decode_jpeg(
        jpeg.encode_progressive_jpeg(_blocks_img(vals), quality=50)
    )[:, :, 0]
    for by in range(3):
        for bx in range(4):
            blk = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == _closed_form(int(vals[by, bx]))).all()


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    quality=st.sampled_from([40, 60, 85]),
)
def test_progressive_equals_baseline_property(seed, h, w, quality):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
    prog = jpeg.decode_jpeg(jpeg.encode_progressive_jpeg(img, quality=quality))
    assert np.array_equal(base, prog)


def test_truncated_rejected():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xe0JFIF-ish")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg at all")


def test_huffman_tables_canonical_complete():
    """Annex K table transcription sanity: value counts and canonical build."""
    assert sum(jpeg._AC_LUMA_BITS) == len(jpeg._AC_LUMA_VALS) == 162
    assert sum(jpeg._AC_CHROMA_BITS) == len(jpeg._AC_CHROMA_VALS) == 162
    assert sum(jpeg._DC_LUMA_BITS) == 12 and sum(jpeg._DC_CHROMA_BITS) == 12
    for bits, vals in [
        (jpeg._DC_LUMA_BITS, jpeg._DC_LUMA_VALS),
        (jpeg._AC_LUMA_BITS, jpeg._AC_LUMA_VALS),
        (jpeg._DC_CHROMA_BITS, jpeg._DC_CHROMA_VALS),
        (jpeg._AC_CHROMA_BITS, jpeg._AC_CHROMA_VALS),
    ]:
        codes = jpeg._build_codes(bits, vals)
        # prefix-free: no code is a prefix of another
        as_bits = sorted(
            format(c, f"0{length}b") for c, length in codes.values()
        )
        for a, b in zip(as_bits, as_bits[1:]):
            assert not b.startswith(a)


def test_quality_scaling_matches_ijg_rule():
    assert jpeg._scaled_quant(jpeg._QUANT_LUMA, 50)[0, 0] == 16  # Annex K verbatim
    assert jpeg._scaled_quant(jpeg._QUANT_LUMA, 100).max() == 1
    assert jpeg._scaled_quant(jpeg._QUANT_LUMA, 10)[7, 7] == 255  # clamped


def _encode_prog_eobn(px, quality=75, restart_interval=0):
    """Test-side progressive encoder exercising what OUR encoder never
    emits: CROSS-BLOCK EOB runs (EOBn, n>0 — Annex K tables lack those
    symbols, so this builds a custom all-8-bit-code Huffman table) with
    spectral selection only (Al=0), optionally split by DRI/RSTn restart
    markers (byte-aligned, DC pred + EOBRUN reset per segment).
    Real-world progressive files from libjpeg-style encoders use exactly
    this shape."""
    import struct

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    qy = jpeg._scaled_quant(jpeg._QUANT_LUMA, quality)
    plane = np.pad(
        px.astype(np.float64) - 128.0,
        ((0, (-h) % 8), (0, (-w) % 8)), mode="edge",
    )
    zz = jpeg._encode_component_blocks(plane, qy)
    dc_codes = jpeg._build_codes(jpeg._DC_LUMA_BITS, jpeg._DC_LUMA_VALS)
    ac_vals = sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {0xF0} | {r << 4 for r in range(15)}
    )
    ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
    ac_codes = jpeg._build_codes(ac_bits, ac_vals)
    nb = zz.shape[0]
    ri = restart_interval

    def dc_scan():
        buf = bytearray()
        wtr = jpeg._BitWriter()
        pred = 0
        rst = 0
        for b in range(nb):
            if ri and b and b % ri == 0:
                wtr.flush()
                buf += wtr.buf + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                wtr = jpeg._BitWriter()
                pred = 0
            dc = int(zz[b][0])
            diff = dc - pred
            pred = dc
            size = jpeg._magnitude(diff)
            c, l = dc_codes[size]
            wtr.put(c, l)
            if size:
                wtr.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        wtr.flush()
        buf += wtr.buf
        return bytes(buf)

    def ac_scan(ss, se):
        buf = bytearray()
        wtr = jpeg._BitWriter()
        eobrun = 0
        rst = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun > 0:
                r = min(14, eobrun.bit_length() - 1)
                take = min(eobrun, (1 << (r + 1)) - 1)
                c, l = ac_codes[r << 4]
                wtr.put(c, l)
                if r:
                    wtr.put(take - (1 << r), r)
                eobrun -= take

        for b in range(nb):
            if ri and b and b % ri == 0:
                flush_eob()
                wtr.flush()
                buf += wtr.buf + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                wtr = jpeg._BitWriter()
            band = zz[b][ss : se + 1]
            nzi = np.nonzero(band)[0]
            if nzi.size == 0:
                eobrun += 1
                if eobrun >= 32767:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last = int(nzi[-1])
            for i in range(last + 1):
                v = int(band[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, l = ac_codes[0xF0]
                    wtr.put(c, l)
                    run -= 16
                size = jpeg._magnitude(v)
                c, l = ac_codes[(run << 4) | size]
                wtr.put(c, l)
                wtr.put(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            if last < se - ss:
                eobrun = 1
        flush_eob()
        wtr.flush()
        buf += wtr.buf
        return bytes(buf)

    out = bytearray(b"\xff\xd8")
    out += jpeg._dqt_segment(0, qy)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += jpeg._dht_segment(0, 0, jpeg._DC_LUMA_BITS, jpeg._DC_LUMA_VALS)
    out += jpeg._dht_segment(1, 0, ac_bits, ac_vals)
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)

    def sos(ss, se):
        body = bytes([1, 1, 0x00, ss, se, 0])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    out += sos(0, 0) + dc_scan()
    out += sos(1, 5) + ac_scan(1, 5)
    out += sos(6, 63) + ac_scan(6, 63)
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_decoder_handles_cross_block_eob_runs():
    """Foreign-encoder shape: EOBn symbols spanning many blocks + custom
    (non-Annex-K) Huffman tables.  Decode must still equal the baseline
    decode of the same quantized coefficients."""
    rng = np.random.default_rng(9)
    sparse = np.full((40, 33), 128, dtype=np.uint8)
    sparse[::7, ::5] = 255  # mostly-empty AC bands → long EOB runs
    cases = [
        rng.integers(0, 256, size=(24, 17), dtype=np.uint8),
        sparse,
        np.full((16, 16), 73, dtype=np.uint8),  # all-zero AC → maximal EOBn
    ]
    for img in cases:
        for q in (30, 75, 90):
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
            got = jpeg.decode_jpeg(_encode_prog_eobn(img, quality=q))
            assert np.array_equal(base, got), (img.shape, q)


def test_progressive_decoder_handles_restart_markers():
    """DRI/RSTn inside progressive scans: byte-aligned entropy segments
    with DC-pred and EOBRUN reset per segment — still pixel-equal to the
    baseline decode."""
    rng = np.random.default_rng(13)
    for shape in [(24, 17), (40, 33)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ri in (1, 3, 5):
            for q in (50, 85):
                base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
                got = jpeg.decode_jpeg(
                    _encode_prog_eobn(img, quality=q, restart_interval=ri)
                )
                assert np.array_equal(base, got), (shape, ri, q)
