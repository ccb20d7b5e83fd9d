"""Persisted inverted text index: incremental build ≡ one-shot, indexed
search ≡ recompute, query-time scan is bucket+bloom pruned."""

import os

import pytest

from linked_maps_spark import text_index, textops
from linked_maps_spark.lakehouse import LakeTable
from linked_maps_spark.util import table_digest

TERMS = ["rare", "common", "alpha"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "rare common common alpha"),
        (2, "common common common common"),
        (3, "rare rare common"),
        (4, "nothing relevant here beta"),
        (5, "rare common common"),
        (6, "alpha beta gamma delta"),
        (7, "gamma gamma rare"),
        (8, "common alpha alpha"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_build_equals_one_shot_and_search_equals_recompute(
    spark, corpus, tmp_path_factory
):
    base = str(tmp_path_factory.mktemp("tix"))
    # one-shot build
    t1 = text_index.build_text_index(
        spark, corpus, os.path.join(base, "one"), n_buckets=4, overwrite=True
    )
    # two-batch incremental build
    t2 = text_index.build_text_index(
        spark, corpus.filter("doc_id <= 4"), os.path.join(base, "two"),
        n_buckets=4, overwrite=True,
    )
    t2 = text_index.build_text_index(
        spark, corpus.filter("doc_id > 4"), os.path.join(base, "two")
    )
    assert table_digest(t1.read()) == table_digest(t2.read())
    assert t1.latest_summary_value("n_docs") == 8
    assert t2.latest_summary_value("n_docs") == 8

    got = [tuple(r) for r in text_index.search_topk_indexed(t2, TERMS, 5).collect()]
    ref = [tuple(r) for r in textops.search_topk(corpus, TERMS, 5).collect()]
    assert got == ref and len(got) == 5


def test_idempotent_postings_and_touched_bucket_merge(spark, corpus, tmp_path_factory):
    """Re-merging an identical batch changes no postings (keyed MERGE); a
    single-term batch touches only that term's bucket."""
    path = str(tmp_path_factory.mktemp("tix2")) + "/idx"
    t = text_index.build_text_index(spark, corpus, path, n_buckets=4, overwrite=True)
    before = table_digest(t.read())
    v0 = t.snapshot()["version"]
    # re-merge batch 1's postings directly (not via build — n_docs contract)
    t.merge_upsert(text_index.term_postings(corpus.filter("doc_id <= 4")),
                   assume_unique=True, summary={"op": "replay"})
    assert table_digest(t.read()) == before
    # single-new-term batch rewrites a strict subset of buckets
    one = spark.createDataFrame([(9, "zeta zeta")], "doc_id long, text string")
    files_before = {f["path"]: f["bucket"] for f in t.snapshot()["files"]}
    t.merge_upsert(text_index.term_postings(one), assume_unique=True,
                   summary={"op": "one-term"})
    files_after = {f["path"]: f["bucket"] for f in t.snapshot()["files"]}
    carried = set(files_before) & set(files_after)
    touched_buckets = {b for p, b in files_after.items() if p not in files_before}
    assert carried  # untouched buckets' files carried over by pointer
    assert len(touched_buckets) == 1  # 'zeta' lives in exactly one bucket


def test_query_scan_is_pruned(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tix3")) + "/idx"
    # two batches → ≥2 files in some buckets; blooms from analyze()
    text_index.build_text_index(spark, corpus.filter("doc_id <= 4"), path,
                                n_buckets=4, overwrite=True)
    t = text_index.build_text_index(spark, corpus.filter("doc_id > 4"), path)
    n_all = len(t.snapshot()["files"])
    n_hit = len(t.files_where([("term", "in", ["rare"])]))
    assert 0 < n_hit < n_all  # manifest-level pruning, no file opens
    # absent term: bloom absence is a proof — zero files opened
    assert t.files_where([("term", "=", "no_such_term_xyz")]) == []
    # and the pruned read still returns exactly the filtered rows
    got = sorted(
        tuple(r) for r in
        t.read_where([("term", "=", "rare")]).select("doc_id", "tf").collect()
    )
    assert got == [(1, 1), (3, 2), (5, 1), (7, 1)]


def test_unbuilt_index_raises(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tix4")) + "/idx"
    t = LakeTable.create(spark, path, text_index.TEXT_INDEX_SCHEMA,
                         key_cols=["term", "doc_id"], bucket_cols=["term"],
                         n_buckets=2)
    with pytest.raises(ValueError, match="n_docs"):
        text_index.search_topk_indexed(t, ["x"], 3)


def test_bm25_matches_python_recompute_and_length_norm(spark, corpus, tmp_path_factory):
    """BM25 from the index ≡ an independent python recompute (rounded to
    9 dp); at equal tf the longer doc scores lower (length normalization)."""
    import math
    from collections import Counter

    path = str(tmp_path_factory.mktemp("tixb")) + "/idx"
    t = text_index.build_text_index(spark, corpus, path, n_buckets=4, overwrite=True)
    terms = ["rare", "common"]
    got = [tuple(r) for r in text_index.bm25_topk(t, terms, k=8).collect()]

    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    toks = {d: txt.strip().lower().split() for d, txt in rows.items()}
    N = len(rows)
    dl = {d: len(tk) for d, tk in toks.items()}
    avgdl = sum(dl.values()) / N
    tf = {d: Counter(tk) for d, tk in toks.items()}
    df = {t_: sum(1 for d in rows if tf[d][t_] > 0) for t_ in terms}
    k1, b = 1.2, 0.75

    def score(d):
        s = 0.0
        hits = 0
        for t_ in terms:
            f = tf[d][t_]
            if not f:
                continue
            hits += 1
            idf = math.log(1 + (N - df[t_] + 0.5) / (df[t_] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
        return round(s, 9), hits

    want = sorted(
        ((d, *score(d)) for d in rows if score(d)[1] > 0),
        key=lambda x: (-x[1], x[0]),
    )[:8]
    assert got == [tuple(w) for w in want]
    # length norm: docs 1 and 5 have identical bags except doc 1 carries an
    # extra token ('alpha') → longer → lower bm25 for the same rare/common tf
    s = {d: sc for d, sc, _ in got}
    assert s[1] < s[5]


def test_doc_stats_incremental_build(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tixc"))
    one = text_index.build_text_index(
        spark, corpus, base + "/one", n_buckets=4, overwrite=True)
    two = text_index.build_text_index(
        spark, corpus.filter("doc_id <= 4"), base + "/two", n_buckets=4, overwrite=True)
    two = text_index.build_text_index(spark, corpus.filter("doc_id > 4"), base + "/two")
    d1 = text_index.doc_stats_table(spark, base + "/one")
    d2 = text_index.doc_stats_table(spark, base + "/two")
    assert d1.latest_summary_value("total_dl") == d2.latest_summary_value("total_dl")
    assert table_digest(d1.read()) == table_digest(d2.read())
    assert [tuple(r) for r in text_index.bm25_topk(one, ["rare"], 3).collect()] == \
           [tuple(r) for r in text_index.bm25_topk(two, ["rare"], 3).collect()]


def test_legacy_index_without_doc_stats_is_backfilled(
    spark, corpus, tmp_path_factory
):
    """An index persisted before the _docs sibling existed (simulated by
    deleting the sibling) must NOT crash incremental builds or BM25; the
    stats are rebuilt from the index's own postings and subsequent results
    match a never-degraded index."""
    import shutil

    base = str(tmp_path_factory.mktemp("tixl"))
    ref = text_index.build_text_index(
        spark, corpus, base + "/ref", n_buckets=4, overwrite=True)
    old = text_index.build_text_index(
        spark, corpus.filter("doc_id <= 4"), base + "/old",
        n_buckets=4, overwrite=True)
    shutil.rmtree(base + "/old_docs")          # the pre-_docs on-disk state
    # incremental build backfills from postings, then merges the new batch
    old = text_index.build_text_index(spark, corpus.filter("doc_id > 4"),
                                      base + "/old")
    d_old = text_index.doc_stats_table(spark, base + "/old")
    d_ref = text_index.doc_stats_table(spark, base + "/ref")
    assert d_old.latest_summary_value("total_dl") == \
           d_ref.latest_summary_value("total_dl")
    assert table_digest(d_old.read()) == table_digest(d_ref.read())
    # BM25 on a legacy index with no sibling at all also self-heals
    shutil.rmtree(base + "/old_docs")
    got = [tuple(r) for r in text_index.bm25_topk(old, ["rare"], 3).collect()]
    assert got == [tuple(r) for r in text_index.bm25_topk(ref, ["rare"], 3).collect()]
