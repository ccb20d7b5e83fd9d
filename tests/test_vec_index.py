"""Persisted ANN index (vec_index.py): indexed queries ≡ the recompute
paths, heavy math runs over only the query rows, the index maintains
incrementally via MERGE, and the trained quantizer beats fixed centroids on
clustered data while staying deterministic."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from linked_maps_spark import similarity, vec_index


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_indexed_ivf_equals_recompute_and_skips_corpus_math(
    spark, emb, tmp_path_factory, monkeypatch
):
    t = vec_index.build_vec_index(
        spark, emb, str(tmp_path_factory.mktemp("vi") / "idx"), n_buckets=4,
        trained=False,  # md5 quantizer: this test compares vs the recompute path
    )
    want = [tuple(r) for r in similarity.ann_ivf_topk(emb, n_queries=5, k=5).collect()]

    calls = []
    orig = similarity._ivf_sims

    def spy(e, n_cells=16, dim=64, centroids=None):
        calls.append(e)
        return orig(e, n_cells, dim, centroids)

    monkeypatch.setattr(similarity, "_ivf_sims", spy)
    got_df = vec_index.ann_ivf_topk_indexed(emb, t, n_queries=5, k=5)
    got = [tuple(r) for r in got_df.collect()]
    assert got == want
    # the centroid expressions were built exactly once — for the query side
    # only (vec_id < n_queries), never over the corpus
    assert len(calls) == 1
    assert calls[0].count() == 5
    # the corpus side of the plan scans the index table's files
    plan = got_df._jdf.queryExecution().toString()
    assert "idx" in plan and "cell" in plan


def test_indexed_lsh_equals_recompute(spark, emb, tmp_path_factory):
    t = vec_index.build_vec_index(
        spark, emb, str(tmp_path_factory.mktemp("vl") / "idx"), n_buckets=4,
        trained=False,
    )
    got = [
        tuple(r)
        for r in vec_index.ann_lsh_topk_indexed(emb, t, n_queries=5, k=5).collect()
    ]
    want = [tuple(r) for r in similarity.ann_lsh_topk(emb, n_queries=5, k=5).collect()]
    assert got == want


def test_ivfpq_indexed_matches_duckdb_and_skips_corpus_math(
    spark, emb, tmp_path_factory, monkeypatch
):
    """The composed IVF+PQ path: probe cells and ADC codes both come FROM
    the index table (no corpus-side cell/code recompute in the query), and
    the full pipeline — probe → ADC shortlist → exact re-rank — is
    value-identical to the independent DuckDB composition."""
    import duckdb

    from linked_maps_spark import vec_index as vi

    t = vi.build_vec_index(
        spark, emb, str(tmp_path_factory.mktemp("vpq") / "idx"), n_buckets=4,
        trained=False,  # the DuckDB oracle replays the md5 cell/code definitions
    )
    # corpus-side index math must NOT run during the query
    for fn in ("ivf_cells", "pq_codes"):
        monkeypatch.setattr(
            vi, fn,
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError(f"{fn} recomputed at query time")
            ),
        )
    got = [
        tuple(r)
        for r in vi.ann_ivfpq_topk_indexed(
            emb, t, n_queries=5, k=5, shortlist=50
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    want = [
        (int(q), int(n), float(c), int(rk))
        for q, n, c, rk in con.execute(
            similarity.ann_ivfpq_topk_sql(n_queries=5, k=5, shortlist=50)
        ).fetchall()
    ]
    assert got == want
    assert len(got) == 25
    # structural containment: every IVF+PQ neighbor came from a probed cell,
    # i.e. is in the IVF-flat candidate set (k=500 ⇒ all candidates ranked)
    ivf_cand = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_ivf_topk(emb, 5, 500).collect()
    }
    assert {(q, n) for q, n, _, _ in got} <= ivf_cand
    # the ADC shortlist is approximate on near-uniform random vectors but
    # still agrees with IVF-flat exact top-1 on most queries
    ivf_top1 = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_ivf_topk(emb, 5, 5).collect()
        if r["rank"] == 1
    }
    pq_top1 = {(q, n) for q, n, _, rk in got if rk == 1}
    assert len(pq_top1 & ivf_top1) >= 3


def test_index_incremental_merge_equals_full_build(spark, emb, tmp_path_factory):
    """The 100 TB maintenance path: first build over the initial corpus,
    then MERGE only the delta — index content identical to a full rebuild."""
    root = tmp_path_factory.mktemp("vinc")
    inc = vec_index.build_vec_index(
        spark, emb.filter(F.col("vec_id") < 400), str(root / "inc"), n_buckets=4,
        trained=False,  # delta-merge must reuse the stored quantizer either way
    )
    inc = vec_index.build_vec_index(
        spark, emb.filter(F.col("vec_id") >= 400), str(root / "inc")
    )
    full = vec_index.build_vec_index(spark, emb, str(root / "full"), n_buckets=4,
                                     trained=False)

    def content(t):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["bands"])) for r in t.read().collect()
        )

    assert content(inc) == content(full)
    # two merges → two data snapshots on the incremental table
    assert inc.version() > full.version()


def _clustered(spark, n_per=40, n_clusters=4, dim=16, seed=3):
    """Well-separated Gaussian clusters — the corpus shape where a trained
    quantizer should beat data-independent random directions."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(n_per):
            v = centers[c] + rng.normal(scale=0.3, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_trained_ivf_recall_and_determinism(spark):
    emb = _clustered(spark)
    nq, k, n_cells, n_probe, dim = 5, 5, 8, 2, 16
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, nq, k).collect()
    }
    cents = vec_index.train_centroids(emb, n_cells=n_cells, dim=dim, iters=4)
    # determinism across runs (rounded Lloyd means)
    assert cents == vec_index.train_centroids(emb, n_cells=n_cells, dim=dim, iters=4)

    def recall(centroids):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ann_ivf_topk(
                emb, nq, k, n_cells=n_cells, n_probe=n_probe, dim=dim,
                centroids=centroids,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_trained, r_fixed = recall(cents), recall(None)
    assert r_trained >= r_fixed
    assert r_trained >= 0.8  # clustered fixture: trained cells ≈ clusters


def test_trained_index_persists_centroids(spark, tmp_path_factory):
    """build_vec_index(trained=True) persists the centroids in the snapshot
    summary; the indexed query reuses them and matches the recompute path
    run with the same centroids."""
    emb = _clustered(spark)
    t = vec_index.build_vec_index(
        spark, emb, str(tmp_path_factory.mktemp("vt") / "idx"),
        n_cells=8, dim=16, trained=True, train_iters=4, n_buckets=4,
    )
    cents = t.latest_summary_value("centroids")
    assert cents and len(cents) == 8 and len(cents[0]) == 16
    got = [
        tuple(r)
        for r in vec_index.ann_ivf_topk_indexed(
            emb, t, n_queries=5, k=5, n_probe=2
        ).collect()
    ]
    want = [
        tuple(r)
        for r in similarity.ann_ivf_topk(
            emb, 5, 5, n_cells=8, n_probe=2, dim=16, centroids=cents
        ).collect()
    ]
    assert got == want


def test_trained_pq_codebooks_cut_quantization_error(spark):
    """Per-subspace Lloyd rounds from the md5 init can only lower the
    k-means objective; on a clustered corpus (scale far outside the random
    books' [-1,1] range) the drop is large.  Training is deterministic
    across runs (rounded means, no RNG)."""
    emb = _clustered(spark)
    kw = dict(m=4, ksub=8, dim=16, iters=4)
    books = vec_index.train_pq_codebooks(emb, **kw)
    assert books == vec_index.train_pq_codebooks(emb, **kw)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    mse_trained = similarity.pq_mse(emb, m=4, ksub=8, dim=16, codebooks=books)
    mse_fixed = similarity.pq_mse(emb, m=4, ksub=8, dim=16)
    assert mse_trained < 0.5 * mse_fixed


def test_trained_ivfpq_index_end_to_end(spark, tmp_path_factory):
    """build_vec_index(trained=True) persists PQ codebooks alongside the
    IVF centroids; with a shortlist covering every candidate, the composed
    IVF+PQ query reduces exactly to IVF-flat under the same trained
    centroids (the ADC stage only orders the shortlist cut)."""
    emb = _clustered(spark)
    t = vec_index.build_vec_index(
        spark, emb, str(tmp_path_factory.mktemp("vtpq") / "idx"),
        n_cells=8, dim=16, trained=True, train_iters=3, n_buckets=4,
        pq_m=4, pq_ksub=8,
    )
    books = t.latest_summary_value("pq_codebooks")
    assert books and len(books) == 4 and len(books[0]) == 8
    got = [
        tuple(r)
        for r in vec_index.ann_ivfpq_topk_indexed(
            emb, t, n_queries=5, k=5, n_probe=2, shortlist=10_000
        ).collect()
    ]
    cents = t.latest_summary_value("centroids")
    want = [
        tuple(r)
        for r in similarity.ann_ivf_topk(
            emb, 5, 5, n_cells=8, n_probe=2, dim=16, centroids=cents
        ).collect()
    ]
    assert got == want


def test_composed_defaults_recall_floor(spark, tmp_path_factory):
    """The round-4 weak mark: calling the production composition with
    DEFAULTS must not give near-random top-k.  Defaults are now a trained
    quantizer (build) + shortlist 200 (query); pin recall@10 >= 0.6 on the
    clustered fixture (800 vectors >> shortlist, so the floor is earned by
    the trained cells + ADC ranking, not by the shortlist covering the
    corpus).  Floor test: regressions in either default fail here."""
    emb = _clustered(spark, n_per=100, n_clusters=8, dim=16, seed=11)
    t = vec_index.build_vec_index(
        spark, emb, str(tmp_path_factory.mktemp("vflr") / "idx"),
        n_cells=16, dim=16, n_buckets=4, pq_m=4, pq_ksub=8,
    )
    assert t.latest_summary_value("centroids") is not None  # trained default
    nq, k = 20, 10
    exact = {}
    for r in similarity.cosine_topk(emb, nq, k).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in vec_index.ann_ivfpq_topk_indexed(emb, t, n_queries=nq, k=k).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / (len(exact) * k)
    assert recall >= 0.6, f"composed-default recall@10 = {recall:.3f}"
