"""Mergeable sketches: HyperLogLog registers and Count-Min.

Exactness of the sketch state is the oracle gate's job (integer-exact,
cross-engine); these tests pin the sketch PROPERTIES: mergeability under
arbitrary sharding, estimator accuracy, and the CMS no-undercount bound.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from linked_maps_spark import sketch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_merge_is_shard_invariant(spark, events):
    """Registers from any sharding merge to the single-pass sketch."""
    whole = sketch.hll_registers(events, F.col("user_id")).orderBy("bucket").collect()
    for mod in (2, 3, 7):
        shards = [
            sketch.hll_registers(
                events.filter(F.col("event_id") % mod == i), F.col("user_id")
            )
            for i in range(mod)
        ]
        merged = sketch.hll_merge(*shards).orderBy("bucket").collect()
        assert merged == whole, f"mod={mod}"


def test_hll_register_values_exact_python(spark):
    """Registers over a tiny known set equal an exact python recompute of
    the same md5 split — no float log, no engine-specific hashing."""
    import hashlib

    vals = [str(i) for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["bucket"]: r["register"]
        for r in sketch.hll_registers(df, F.col("v")).collect()
    }
    want = {j: 0 for j in range(sketch.HLL_M)}
    for v in vals:
        d = hashlib.md5(v.encode()).hexdigest()
        bucket = int(d[:8], 16) % sketch.HLL_M
        w = int(d[8:16], 16)
        rho = 33 if w == 0 else 33 - w.bit_length()
        want[bucket] = max(want[bucket], rho)
    assert got == want


def test_hll_estimate_accuracy(spark):
    """Standard error for m=64 is ~1.04/√64 = 13%; give 3σ headroom."""
    n = 2000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    regs = sketch.hll_registers(df, F.col("v"))
    est = sketch.hll_estimate(regs)
    assert abs(est - n) / n < 0.4
    # estimate is a pure function of the registers (deterministic)
    assert est == sketch.hll_estimate(regs)


def test_hll_estimate_small_range_linear_counting(spark):
    """With far fewer values than buckets the linear-counting branch fires
    and is near-exact."""
    df = spark.createDataFrame([(str(i),) for i in range(8)], "v string")
    est = sketch.hll_estimate(sketch.hll_registers(df, F.col("v")))
    assert abs(est - 8) < 2


def test_cms_never_undercounts_and_merge(spark, events):
    whole = sketch.cms_sketch(events, F.col("event_type"))
    shards = [
        sketch.cms_sketch(events.filter(F.col("event_id") % 3 == i), F.col("event_type"))
        for i in range(3)
    ]
    merged = sketch.cms_merge(*shards)
    key = lambda rows: sorted((r["r"], r["bucket"], r["cnt"]) for r in rows)  # noqa: E731
    assert key(merged.collect()) == key(whole.collect())

    est = {
        r["v"]: r["cms_count"]
        for r in sketch.cms_point_estimates(whole, events, F.col("event_type")).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert est[k] >= exact[k], k  # CMS is an upper bound, always


def test_cms_absent_key_estimates_bounded(spark, events):
    """A key never inserted gets whatever collisions its cells carry — at
    most the min cell load, never a crash or a negative."""
    probe = events.sparkSession.createDataFrame(
        [("never-seen-key",)], "event_type string"
    )
    sk = sketch.cms_sketch(events, F.col("event_type"))
    [row] = sketch.cms_point_estimates(sk, probe, F.col("event_type")).collect()
    assert 0 <= row["cms_count"] <= events.count()


def test_sketch_driver_queries_match_duckdb(spark):
    import hashlib

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")

    def h(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return hashlib.sha256(df.astype(str).to_csv(index=False).encode()).hexdigest()

    for name, fn in sketch.QUERIES.items():
        got = fn(spark, SF).toPandas()
        want = con.execute(sketch.ORACLES[name]).df()
        assert h(got) == h(want), name


def test_hll_plan_is_partial_aggregate(spark, events):
    """The sketch build must partial-aggregate map-side (two HashAggregate
    rounds around one exchange), not shuffle raw values."""
    plan = (
        sketch.hll_registers(events, F.col("user_id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2


def test_hist_merge_shard_invariant_and_total(spark, events):
    whole = sketch.hist_sketch(events, F.col("value"), 0.0, 512.0)
    shards = [
        sketch.hist_sketch(
            events.filter(F.col("event_id") % 4 == i), F.col("value"), 0.0, 512.0
        )
        for i in range(4)
    ]
    merged = sketch.hist_merge(*shards)
    key = lambda rows: sorted((r["bucket"], r["cnt"]) for r in rows)  # noqa: E731
    assert key(merged.collect()) == key(whole.collect())
    # total over any input: out-of-range values clamp into edge buckets
    assert sum(c for _, c in key(whole.collect())) == events.count()


def test_hist_quantile_accuracy_vs_numpy(spark, events):
    import numpy as np

    sk = sketch.hist_sketch(events, F.col("value"), 0.0, 512.0)
    vals = np.array([r["value"] for r in events.select("value").collect()])
    width = 512.0 / sketch.HIST_BUCKETS
    for q in (0.1, 0.5, 0.9, 0.99):
        est = sketch.hist_quantile(sk, q, 0.0, 512.0)
        true = float(np.quantile(vals, q))
        assert abs(est - true) <= width + 1e-9, (q, est, true)


def test_hist_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (511.9,), (900.0,)], "value double")
    got = {
        r["bucket"]: r["cnt"]
        for r in sketch.hist_sketch(df, F.col("value"), 0.0, 512.0).collect()
    }
    assert got == {0: 2, sketch.HIST_BUCKETS - 1: 2}


def test_hist_and_cms_exclude_nulls(spark):
    """NULLs must be excluded from both sketches: Spark's least/greatest
    SKIP nulls (a NULL value would land in the histogram's top bucket) and
    concat_ws skips them (a NULL key would hash as the bare row index into
    an unrelated CMS cell) while DuckDB's || NULL-propagates — the engines
    only agree on 'NULLs out'."""
    vals = spark.createDataFrame([(1.0,), (None,), (300.0,)], "value double")
    hist = sketch.hist_sketch(vals, F.col("value"), 0.0, 512.0).collect()
    assert sum(r["cnt"] for r in hist) == 2
    assert all(r["bucket"] != sketch.HIST_BUCKETS - 1 for r in hist)

    keys = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    cms = sketch.cms_sketch(keys, F.col("k"))
    assert cms.agg(F.sum("cnt")).first()[0] == 2 * sketch.CMS_D
    est = sketch.cms_point_estimates(cms, keys, F.col("k")).collect()
    assert {(r["v"], r["cms_count"]) for r in est} == {("a", 2)}
