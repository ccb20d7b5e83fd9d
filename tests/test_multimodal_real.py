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
    assert rows[3]["kind"] == "image" and rows[6]["kind"] == "image"
    # doc 3 → (3//3)%2=1 → PNG; doc 6 → (6//3)%2=0 → BMP: both branches live
    assert rows[3]["declared_mime"] == "image/png"
    assert rows[6]["declared_mime"] == "image/bmp"
    assert rows[1]["declared_mime"] == "audio/wav"
    assert rows[2]["declared_mime"] == "image/x-portable-pixmap"  # P6 stream
    # metadata magic agrees with the payload's real container
    meta = {r["media_id"]: r for r in multimodal.media_metadata(media).collect()}
    assert meta[6]["magic"].startswith("424D")  # 'BM'
    assert meta[3]["magic"] == "89504E47"  # \x89PNG
    assert meta[1]["magic"] == "52494646"  # RIFF


def test_real_decode_features_all_kinds(docs, media):
    feats = {r["media_id"]: r for r in multimodal.decode_features(media, fake=False).collect()}
    assert set(feats) == {1, 2, 3, 4, 5, 6}
    for mid, r in feats.items():
        expect = 6 if mid % 3 == 1 else 3 + 3 + 3 + 8  # audio vs image stats
        assert r["feat_dim"] == expect and len(r["feature"]) == expect
    # value parity with a local decode of the same payload (doc 3 = PNG)
    _, payload = _local_payloads(docs)[3]
    local = codecs.image_features(codecs.decode_png(payload))
    assert np.allclose(np.array(feats[3]["feature"], dtype=np.float32), local)
    # audio features: n and rate columns are exact
    _, wav = _local_payloads(docs)[4]
    local_a = codecs.audio_features(*codecs.decode_wav(wav))
    assert np.allclose(np.array(feats[4]["feature"], dtype=np.float32), local_a)


def test_real_resize_emits_valid_bmp_thumbs(media):
    visual = media.filter("kind <> 'audio'")
    thumbs = multimodal.resize_images(visual, 16, 12, fake=False).collect()
    assert len(thumbs) == 4
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


def test_jpeg_still_raises_documented(spark):
    jpeg = spark.createDataFrame(
        [(99, "image", bytearray(b"\xff\xd8\xff\xe0JFIF-ish"), "image/jpeg")],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="JPEG"):
        multimodal.decode_features(jpeg, fake=False).collect()


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
    assert set(rows) == {3, 6}
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
    assert set(rows) == {3, 6}  # doc_id % 3 == 0
    r = rows[3]
    w, h = 8 + 3 % 5, 6 + 3 % 4  # 11 x 7... (3%5=3 → w=11, 3%4=3 → h=9)
    assert (r["width"], r["height"]) == (w, h)
    stride = (w * 3 + 3) & ~3
    assert r["n_bytes"] == 54 + h * stride
    j = np.arange(w * h * 3, dtype=np.int64)
    assert r["pixel_sum"] == int(((3 * 7 + j * 13) % 256).sum())
