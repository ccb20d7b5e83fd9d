"""Streaming corpus curation: stateless stages ≡ batch, exact dedup across
micro-batches, and dedup state surviving a checkpoint restart."""

from linked_maps_spark import sampling
from linked_maps_spark.streaming import DOCS_SCHEMA, stream_curate


def _write(spark, rows, path):
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("append").parquet(path)


def test_stream_curate_dedups_and_matches_batch(spark, tmp_path):
    land = str(tmp_path / "docs")
    rows1 = [(i, f"doc text number {i}", "en", "s0", 10) for i in range(10)]
    # 5 duplicates of file 1's texts under new ids + 5 fresh docs (one with PII)
    rows2 = [(100 + i, f"doc text number {i}", "en", "s1", 10) for i in range(5)]
    rows2 += [(200 + i, f"fresh text {i}", "de", "s1", 10) for i in range(4)]
    rows2 += [(209, "mail me at x@y.io", "de", "s1", 10)]
    _write(spark, rows1, land)
    _write(spark, rows2, land)

    out = str(tmp_path / "out")
    got = stream_curate(spark, land, str(tmp_path / "ck"), out).collect()
    hashes = [r["content_md5"] for r in got]
    assert len(hashes) == len(set(hashes)) == 15  # 20 docs, 5 cross-file dups
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[209]["n_pii"] == 1 and by_id[209]["n_tokens"] == 4
    assert all(r["n_pii"] == 0 for r in got if r["doc_id"] != 209)
    # split bands match the batch expression for every surviving doc
    batch = {
        r["doc_id"]: r["split"]
        for r in sampling.corpus_split(
            spark.createDataFrame(rows1 + rows2, DOCS_SCHEMA)
        ).collect()
    }
    assert all(r["split"] == batch[r["doc_id"]] for r in got)

    # restart with the SAME checkpoint: dedup state must persist, so dups of
    # file-1 texts arriving later are still dropped and only new docs emit
    rows3 = [(300 + i, f"doc text number {i}", "en", "s2", 10) for i in range(3)]
    rows3 += [(310, "late arrival one", "en", "s2", 10),
              (311, "late arrival two", "en", "s2", 10)]
    _write(spark, rows3, land)
    after = stream_curate(spark, land, str(tmp_path / "ck"), out).collect()
    new_ids = {r["doc_id"] for r in after} - {r["doc_id"] for r in got}
    assert sorted(new_ids) == [310, 311]
    hashes2 = [r["content_md5"] for r in after]
    assert len(hashes2) == len(set(hashes2)) == 17  # still globally unique
