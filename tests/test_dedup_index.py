"""Persisted MinHash dedup index: build, incremental refresh, incremental
query ≡ batch operator restricted to pairs touching the new batch."""

import pytest

from linked_maps_spark import dedup, dedup_index
from linked_maps_spark.lakehouse import LakeTable


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_incremental_equals_batch_restriction(spark, docs, tmp_path_factory):
    """dedup_minhash_incremental(batch, index(corpus)) must equal the batch
    operator over corpus ∪ batch filtered to pairs with a new side — same
    buckets, same union-counted ceiling, same scores."""
    corpus = docs.filter(f"NOT ({dedup_index.NEW_PRED})")
    batch = docs.filter(dedup_index.NEW_PRED)
    idx = dedup_index.build_dedup_index(
        spark, corpus, str(tmp_path_factory.mktemp("didx") / "idx"), n_buckets=4
    )
    got = [
        tuple(r) for r in dedup_index.dedup_minhash_incremental(batch, idx).collect()
    ]
    dedup.clear_cache()
    want = [
        tuple(r)
        for r in dedup.dedup_minhash_lsh(docs).collect()
        if r["doc_a"] % 4 == 0 or r["doc_b"] % 4 == 0
    ]
    assert got == want
    assert got  # the fixture corpus has near-dup pairs crossing the split


def test_index_incremental_refresh_equals_full_build(spark, docs, tmp_path_factory):
    """First build over the corpus, then MERGE only the batch: index content
    identical to one full build over everything."""
    root = tmp_path_factory.mktemp("dinc")
    corpus = docs.filter(f"NOT ({dedup_index.NEW_PRED})")
    batch = docs.filter(dedup_index.NEW_PRED)
    inc = dedup_index.build_dedup_index(spark, corpus, str(root / "inc"), n_buckets=4)
    inc = dedup_index.build_dedup_index(spark, batch, str(root / "inc"), n_buckets=4)
    full = dedup_index.build_dedup_index(spark, docs, str(root / "full"), n_buckets=4)

    def content(t: LakeTable):
        return sorted(
            (r["doc_id"], tuple(r["sig"]), tuple(r["bands"]))
            for r in t.read().collect()
        )

    assert content(inc) == content(full)
    assert inc.version() > full.version()  # two merges vs one
    # params persisted and reused across refreshes
    assert inc.latest_summary_value("perms") == dedup.MINHASH_PERMS
