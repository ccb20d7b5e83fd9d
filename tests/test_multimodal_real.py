"""End-to-end tests for the REAL multimodal decode path (``fake=False``):
spec-conformant BMP/PNG/WAV/P6-stream payloads synthesized distributed,
decoded distributed, values cross-checked against local recompute."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from linked_maps_spark import codecs, multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and looked at the dog", "en", "s1", 45),
        (2, "the cat sat on the mat and looked at the dog", "en", "s2", 45),
        (3, "the cat sat on the mat and stared at the dog", "en", "s1", 45),
        (4, "der hund und die katze und das haus ist hier", "de", "s1", 45),
        (5, "completely different words entirely unrelated text here now", "en", "s3", 60),
        (6, "another image document so both bmp and png branches run", "en", "s1", 56),
        (9, "a third image document so the bmp branch keeps running too", "en", "s2", 58),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def media(docs):
    return multimodal.synth_real_media(docs).cache()


def _local_payloads(docs):
    return {
        r["doc_id"]: multimodal._synth_payload(r["doc_id"], r["text"])
        for r in docs.select("doc_id", "text").collect()
    }


def test_synth_real_media_formats(docs, media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert all(rows[i]["kind"] == "image" for i in (3, 6, 9))
    # images rotate by (doc_id//3)%3: 9 → BMP, 3 → PNG, 6 → JPEG — all live
    assert rows[9]["declared_mime"] == "image/bmp"
    assert rows[3]["declared_mime"] == "image/png"
    assert rows[6]["declared_mime"] == "image/jpeg"
    assert rows[1]["declared_mime"] == "audio/wav"
    assert rows[2]["declared_mime"] == "image/x-portable-pixmap"  # P6 stream
    # metadata magic agrees with the payload's real container
    meta = {r["media_id"]: r for r in multimodal.media_metadata(media).collect()}
    assert meta[9]["magic"].startswith("424D")  # 'BM'
    assert meta[3]["magic"] == "89504E47"  # \x89PNG
    assert meta[6]["magic"].startswith("FFD8FF")  # JPEG SOI
    assert meta[1]["magic"] == "52494646"  # RIFF


def test_real_decode_features_all_kinds(docs, media):
    feats = {r["media_id"]: r for r in multimodal.decode_features(media, fake=False).collect()}
    assert set(feats) == {1, 2, 3, 4, 5, 6, 9}
    for mid, r in feats.items():
        expect = 6 if mid % 3 == 1 else 3 + 3 + 3 + 8  # audio vs image stats
        assert r["feat_dim"] == expect and len(r["feature"]) == expect
    # value parity with a local decode of the same payload (doc 3 = PNG)
    _, payload = _local_payloads(docs)[3]
    local = codecs.image_features(codecs.decode_png(payload))
    assert np.allclose(np.array(feats[3]["feature"], dtype=np.float32), local)
    # doc 6 = JPEG: really entropy-decoded distributed, parity with local
    _, jpg = _local_payloads(docs)[6]
    local_j = codecs.image_features(codecs.decode_jpeg(jpg))
    assert np.allclose(np.array(feats[6]["feature"], dtype=np.float32), local_j)
    # audio features: n and rate columns are exact
    _, wav = _local_payloads(docs)[4]
    local_a = codecs.audio_features(*codecs.decode_wav(wav))
    assert np.allclose(np.array(feats[4]["feature"], dtype=np.float32), local_a)


def test_real_resize_emits_valid_bmp_thumbs(media):
    visual = media.filter("kind <> 'audio'")
    thumbs = multimodal.resize_images(visual, 16, 12, fake=False).collect()
    assert len(thumbs) == 5  # 3 images (bmp/png/jpeg) + 2 P6 video streams
    for r in thumbs:
        img = codecs.decode_bmp(bytes(r["thumb"]))
        assert img.shape == (12, 16, 3)


def test_real_frame_sampling_content_addressed(docs, media):
    # videos: docs 2 and 5, each 2 + doc_id%3 = 4 frames at src_fps=4
    frames = multimodal.sample_frames(media, fps=2.0, fake=False, src_fps=4.0).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in frames}
    # fps=2 over src_fps=4 → source indices 0 and 2 per video
    assert set(got) == {(2, 0), (2, 2), (5, 0), (5, 2)}
    payloads = _local_payloads(docs)
    for (mid, idx), r in got.items():
        local_frames = codecs.decode_ppm_stream(payloads[mid][1])
        assert r["frame"] == hashlib.sha256(local_frames[idx].tobytes()).hexdigest()
        assert r["frame_offset_s"] == idx / 4.0


def test_real_resize_grey_alpha_png(spark):
    """2-channel (grey+alpha) PNGs — a format decode_png supports — must
    resize by replicating luma, not crash encode_bmp."""
    ga = np.dstack([np.full((5, 4), 77, np.uint8), np.full((5, 4), 255, np.uint8)])
    media = spark.createDataFrame(
        [(1, "image", bytearray(codecs.encode_png(ga)), "image/png")],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.resize_images(media, 8, 6, fake=False).collect()
    img = codecs.decode_bmp(bytes(rows[0]["thumb"]))
    assert img.shape == (6, 8, 3) and np.all(img == 77)


def test_real_frame_sampling_dedupes_when_fps_exceeds_source(docs, media):
    """fps > src_fps: consecutive ticks map to the same source frame and
    must not emit duplicate (media_id, frame_idx) rows."""
    frames = multimodal.sample_frames(
        media, fps=8.0, max_frames=6, fake=False, src_fps=4.0
    ).collect()
    seen = [(r["media_id"], r["frame_idx"]) for r in frames]
    assert len(seen) == len(set(seen))
    # videos have 4 frames; ticks 0..5 at idx=round-half-up(k/2) → 0,1,1,2,2,3
    per_media = {}
    for mid, idx in seen:
        per_media.setdefault(mid, []).append(idx)
    assert all(v == [0, 1, 2, 3] for v in per_media.values())


def test_progressive_jpeg_still_raises_documented(spark):
    """Baseline JPEG now decodes for real; progressive (SOF2) remains the
    documented NotImplementedError."""
    sof2 = b"\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    prog = spark.createDataFrame(
        [(99, "image", bytearray(b"\xff\xd8" + sof2 + b"\xff\xd9"), "image/jpeg")],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="progressive"):
        multimodal.decode_features(prog, fake=False).collect()


def test_jpeg_roundtrip_stats_values(docs):
    rows = {r["media_id"]: r for r in multimodal.jpeg_roundtrip_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6, 9}
    r = rows[5]
    wb, hb = 2 + 5 % 3, 1 + 5 % 2  # 4 x 2 blocks
    assert (r["width"], r["height"]) == (8 * wb, 8 * hb)
    b = np.arange(wb * hb, dtype=np.int64)
    v = (5 * 13 + b * 29) % 256
    d = v - 128
    dec = np.where(
        d >= 0,
        np.minimum(128 + 2 * ((d + 1) // 2), 255),
        np.maximum(128 - 2 * ((-d + 1) // 2), 0),
    )
    assert r["pixel_sum"] == int(dec.sum()) * 64
    assert r["blockpos_sum"] == int((dec * b).sum()) * 64


def test_wav_roundtrip_stats_values(docs):
    rows = {r["media_id"]: r for r in multimodal.wav_roundtrip_stats(docs).collect()}
    assert set(rows) == {1, 4}  # doc_id % 3 == 1
    # doc 1: n = 65, samples ((31 + 7919 i) % 65536) - 32768
    i = np.arange(65, dtype=np.int64)
    v = (1 * 31 + i * 7919) % 65536 - 32768
    r = rows[1]
    assert r["sample_rate"] == 8100 and r["n_samples"] == 65
    assert r["min_s"] == v.min() and r["max_s"] == v.max() and r["sum_s"] == v.sum()
    sign = v < 0
    assert r["crossings"] == int(np.count_nonzero(sign[1:] != sign[:-1]))


def test_png_roundtrip_stats_values(docs):
    rows = {r["media_id"]: r for r in multimodal.png_roundtrip_stats(docs).collect()}
    assert set(rows) == {2, 5}  # doc_id % 3 == 2
    r = rows[5]
    w, h = 5 + 5 % 7, 4 + 5 % 5  # 10 x 4
    assert (r["width"], r["height"]) == (w, h)
    j = np.arange(w * h * 3, dtype=np.int64)
    v = (5 * 11 + j * 17) % 256
    assert r["pixel_sum"] == int(v.sum())
    assert r["pixel_xor"] == int(np.bitwise_xor.reduce(v))


def test_resize_nearest_roundtrip_values(docs):
    rows = {r["media_id"]: r for r in multimodal.resize_roundtrip_stats(docs).collect()}
    assert set(rows) == {3, 6, 9}
    r = rows[6]
    w, h = 8 + 6 % 5, 6 + 6 % 4  # 9 x 8
    j = np.arange(w * h * 3, dtype=np.int64)
    px = ((6 * 7 + j * 13) % 256).reshape(h, w, 3)
    sy = ((2 * np.arange(3) + 1) * h) // 6
    sx = ((2 * np.arange(4) + 1) * w) // 8
    small = px[sy][:, sx].reshape(-1)
    assert r["pixel_sum"] == int(small.sum())
    assert r["pos_sum"] == int((small * np.arange(small.size)).sum())
    assert r["pixel_xor"] == int(np.bitwise_xor.reduce(small))


def test_bmp_roundtrip_stats_values(docs):
    rows = {r["media_id"]: r for r in multimodal.bmp_roundtrip_stats(docs).collect()}
    assert set(rows) == {3, 6, 9}  # doc_id % 3 == 0
    r = rows[3]
    w, h = 8 + 3 % 5, 6 + 3 % 4  # 11 x 7... (3%5=3 → w=11, 3%4=3 → h=9)
    assert (r["width"], r["height"]) == (w, h)
    stride = (w * 3 + 3) & ~3
    assert r["n_bytes"] == 54 + h * stride
    j = np.arange(w * h * 3, dtype=np.int64)
    assert r["pixel_sum"] == int(((3 * 7 + j * 13) % 256).sum())
