"""Randomized cross-checks of the new corpus operators against tiny pure-
Python oracles: connected components vs union-find, sequence packing vs a
driver-side prefix-sum recompute.  Deterministic seeds keep runtime bounded
while exercising shapes the hand fixtures don't (cycles, stars, singleton
merges, ragged streams)."""

import random

import pytest

from linked_maps_spark import dedup, textops


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [1, 7, 23, 101])
def test_connected_components_random_vs_union_find(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(5, 40)
    m = rng.randint(3, 60)
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(m)
            )
            if a != b
        }
    )
    want = _union_find(pairs)
    sizes = {}
    for root in want.values():
        sizes[root] = sizes.get(root, 0) + 1
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "doc_a long, doc_b long, jaccard double"
    )
    got = dedup.connected_components(df).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in got} == want
    assert all(r["cluster_size"] == sizes[r["cluster_id"]] for r in got)


@pytest.mark.parametrize("seed", [3, 42])
def test_pack_sequences_random_vs_prefix_sums(spark, seed):
    rng = random.Random(seed)
    seq_len = rng.choice([4, 7, 16])
    rows = []
    for i in range(rng.randint(5, 60)):
        n_tok = rng.randint(1, 3 * seq_len)
        rows.append((i, " ".join(f"t{j}" for j in range(n_tok)),
                     f"s{rng.randrange(3)}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in
           textops.pack_sequences(docs, seq_len=seq_len).collect()}
    offsets = {}
    for doc_id, text, source in rows:  # doc_id order per stream
        n = len(text.split())
        start = offsets.get(source, 0)
        offsets[source] = start + n
        r = got[doc_id]
        assert r["n_tokens"] == n and r["start_offset"] == start
        assert r["seq_first"] == start // seq_len
        assert r["seq_last"] == (start + n - 1) // seq_len
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1


@pytest.mark.parametrize("seed", [3, 41])
def test_scd2_incremental_random_splits_equal_from_scratch(spark, seed, tmp_path):
    """Randomized SCD2 maintenance invariant: ANY time-ordered batch split
    of a random event stream, applied incrementally, yields a dimension
    digest-equal to the from-scratch history — including same-timestamp
    runs (ties broken by event_id) and keys absent from early batches."""
    import datetime as dt

    from linked_maps_spark import temporal
    from linked_maps_spark.lakehouse import LakeTable
    from linked_maps_spark.util import table_digest
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    t = 0
    for i in range(rng.randint(30, 80)):
        # ~1 in 4 events repeats the previous timestamp (tie pressure)
        t += 0 if (rng.random() < 0.25 and t) else rng.randint(1, 900)
        rows.append(
            (i, base + dt.timedelta(seconds=t), rng.randrange(6),
             rng.choice(["a", "b", "c"]), round(rng.uniform(0, 100), 2), "{}")
        )
    ev_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # random time-ordered cut points
    cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 4)))
    cuts = [0] + cuts + [len(rows)]

    events_tbl = LakeTable.create(
        spark, str(tmp_path / "ev"), ev_schema, key_cols=[], n_buckets=1
    )
    dim = temporal.create_scd2_table(spark, str(tmp_path / "dim"), n_buckets=4)
    for lo, hi in zip(cuts, cuts[1:]):
        events_tbl.append(spark.createDataFrame(rows[lo:hi], ev_schema))
        temporal.maintain_scd2(events_tbl, dim)
    want = temporal.scd2_history(
        spark.createDataFrame(rows, ev_schema).select(
            "user_id", "event_id", F.col("event_type").alias("state"),
            "value", "ts",
        ),
        key_cols=["user_id"], time_col="ts", order_cols=["event_id"],
        attrs=["event_id", "state", "value"],
    ).select(*dim.schema().names)
    assert table_digest(dim.read()) == table_digest(want)
