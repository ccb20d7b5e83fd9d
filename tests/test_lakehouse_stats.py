"""File-level column stats in manifests + predicate file skipping.

The Iceberg-parity slice: writers record per-file column lower/upper bounds
and null counts (``_footer_stats``); ``files_where``/``read_where`` prune
whole files on them before the scan opens anything; ``analyze()`` backfills
stats for adopted files as maintenance.  Correctness never depends on stats:
the residual filter is always applied, pruning only removes files PROVEN
empty for the predicate.
"""

import pytest
from pyspark.sql import functions as F

from linked_maps_spark.lakehouse import LakeTable, _may_match


@pytest.fixture()
def tbl(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), "k string, v long, s string",
        key_cols=["k"], n_buckets=2,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, s string")


def _rows(df):
    return sorted((r["k"], r["v"], r["s"]) for r in df.collect())


def test_write_collects_footer_stats(spark, tbl):
    tbl.append(_df(spark, [("a", 1, "x"), ("b", 9, None)]))
    entries = tbl.snapshot()["files"]
    assert entries and all("rows" in f and "stats" in f for f in entries)
    assert sum(f["rows"] for f in entries) == 2
    vs = [f["stats"]["v"] for f in entries]
    assert min(s["min"] for s in vs) == 1
    assert max(s["max"] for s in vs) == 9
    assert sum(f["stats"]["s"]["nulls"] for f in entries) == 1


def test_files_where_prunes_disjoint_ranges(spark, tbl):
    tbl.append(_df(spark, [("a", i, "lo") for i in range(10)]))
    tbl.append(_df(spark, [("b", 100 + i, "hi") for i in range(10)]))
    all_files = tbl.snapshot()["files"]
    kept = tbl.files_where([("v", ">", 50)])
    assert kept and len(kept) < len(all_files)
    assert all("v2" in f["path"] for f in kept)  # only the second append
    # the pruned scan is exactly the filtered full scan
    assert _rows(tbl.read_where([("v", ">", 50)])) == _rows(
        tbl.read().filter(F.col("v") > 50)
    )
    # and the disjoint predicate prunes everything yet still answers
    assert tbl.files_where([("v", "between", (40, 60))]) == []
    assert tbl.read_where([("v", "between", (40, 60))]).count() == 0


@pytest.mark.parametrize(
    "preds, cond",
    [
        ([("v", "=", 105)], lambda: F.col("v") == 105),
        ([("v", "in", [3, 104])], lambda: F.col("v").isin([3, 104])),
        ([("v", "<=", 2), ("s", "=", "lo")],
         lambda: (F.col("v") <= 2) & (F.col("s") == "lo")),
        ([("s", "is_null")], lambda: F.col("s").isNull()),
        ([("s", "not_null"), ("v", ">=", 100)],
         lambda: F.col("s").isNotNull() & (F.col("v") >= 100)),
    ],
)
def test_read_where_matches_filter(spark, tbl, preds, cond):
    tbl.append(_df(spark, [("a", i, "lo") for i in range(10)]))
    tbl.append(_df(spark, [("b", 100 + i, None if i % 2 else "hi") for i in range(10)]))
    assert _rows(tbl.read_where(preds)) == _rows(tbl.read().filter(cond()))


def test_all_null_file_pruned_for_comparisons(spark, tbl):
    tbl.append(_df(spark, [("a", 1, None), ("a2", 2, None)]))
    assert tbl.files_where([("s", "=", "anything")]) == []
    assert tbl.files_where([("s", "is_null")]) != []
    assert tbl.read_where([("s", "is_null")]).count() == 2


def test_long_string_bounds_stay_conservative(spark, tbl):
    # a >64-char value: min is a truncated (still valid) lower bound, max is
    # dropped — a predicate above the truncated prefix must NOT prune
    tbl.append(_df(spark, [("a", 1, "a" * 100)]))
    (entry,) = tbl.snapshot()["files"]
    assert entry["stats"]["s"]["min"] == "a" * 64
    assert entry["stats"]["s"]["max"] is None
    assert tbl.read_where([("s", ">", "a" * 70)]).count() == 1  # kept via None max
    assert tbl.files_where([("s", "<", "a" * 10)]) == []  # provably below min


def test_type_mismatch_and_missing_stats_keep_file():
    entry = {"path": "p", "bucket": 0, "rows": 5,
             "stats": {"v": {"min": 1, "max": 9, "nulls": 0}}}
    assert _may_match(entry, [("v", ">", "zzz")])  # literal type mismatch
    assert _may_match(entry, [("other_col", "=", 7)])  # no stats for col
    assert _may_match({"path": "p", "bucket": 0}, [("v", "=", 1)])  # no stats at all
    assert not _may_match(entry, [("v", ">", 9)])


def test_unknown_op_raises(tbl):
    with pytest.raises(ValueError, match="unsupported predicate op"):
        tbl.files_where([("v", "like", "x%")])
    with pytest.raises(ValueError, match="unsupported predicate op"):
        tbl.read_where([("v", "like", "x%")])


def test_analyze_backfills_adopted_files(spark, tbl, tmp_path, monkeypatch):
    import linked_maps_spark.lakehouse as lh

    tbl.append(_df(spark, [("a", 1, "x")]))
    # externally written file adopted without stats (the ingest hot path)
    ext = str(tmp_path / "ext")
    src = _df(spark, [("b", 200, "y")]).withColumn("_b", tbl.bucket_expr(_df(spark, [("b", 200, "y")])))
    b = src.select("_b").collect()[0]["_b"]
    src.drop("_b").coalesce(1).write.mode("overwrite").parquet(ext)
    import glob
    part = glob.glob(ext + "/*.parquet")[0]
    tbl.adopt_merge([(part, b)], tbl.schema(), [b])()
    missing = [f for f in tbl.snapshot()["files"] if "stats" not in f]
    assert missing  # adopted entry carries no stats yet
    # conservative: the stats-less file is always kept
    assert any("stats" not in f for f in tbl.files_where([("v", "<", 0)]))

    v_before = tbl.version()
    tbl.analyze()
    assert tbl.version() == v_before + 1
    assert all("stats" in f for f in tbl.snapshot()["files"])
    # now the same predicate proves the adopted file empty
    assert tbl.files_where([("v", "<", 0)]) == []
    assert _rows(tbl.read_where([("v", ">=", 200)])) == [("b", 200, "y")]
    # analyze with nothing to do is a no-op (no version bump)
    assert tbl.analyze() == tbl.version() == v_before + 1
    # content untouched: the change feed across the analyze commit is empty
    assert tbl.changes(v_before, tbl.version()).count() == 0


def test_read_appended_spans_analyze_commits(spark, tmp_path, monkeypatch):
    import linked_maps_spark.lakehouse as lh

    log = LakeTable.create(spark, str(tmp_path / "log"), "e long", key_cols=[], n_buckets=1)
    log.append(spark.range(3).select(F.col("id").alias("e")))
    # write one append blind (no footer harvest) so analyze has work
    monkeypatch.setattr(lh, "_footer_stats", lambda p: (None, {}))
    log.append(spark.range(3, 5).select(F.col("id").alias("e")))
    monkeypatch.undo()
    v_appends = log.version()
    log.analyze()
    assert log.version() == v_appends + 1
    got = sorted(r["e"] for r in log.read_appended(1, log.version()).collect())
    assert got == [3, 4]


def test_bloom_prunes_interleaved_point_lookups(spark, tbl):
    """Min/max can't prune interleaved key ranges; blooms can.  Absence is
    a proof (file skipped), presence keeps the file, results never change."""
    # two appends whose key ranges fully interleave → bounds nearly useless
    tbl.append(_df(spark, [(f"k{i:03d}", 1, "f1") for i in range(0, 200, 2)]))
    tbl.append(_df(spark, [(f"k{i:03d}", 2, "f2") for i in range(1, 200, 2)]))
    probe = "k101"  # lives only in the second append
    before = tbl.files_where([("k", "=", probe)])
    assert len(before) > 1  # interleaved ranges: bounds keep extra files

    v0 = tbl.version()
    tbl.analyze(bloom_cols=["k"])
    assert tbl.version() == v0 + 1
    after = tbl.files_where([("k", "=", probe)])
    assert len(after) < len(before)
    # the bloom's verdict is honest: every kept file truly holds the key
    # range (only second-append files can), and results are unchanged
    assert all("v2" in f["path"] for f in after)
    assert _rows(tbl.read_where([("k", "=", probe)])) == _rows(
        tbl.read().filter(F.col("k") == probe)
    )
    # a key in neither append prunes everything, yet read_where answers
    assert tbl.files_where([("k", "=", "zz")]) == []
    assert tbl.read_where([("k", "=", "zz")]).count() == 0
    # IN probes: any member present keeps the file
    assert tbl.files_where([("k", "in", ["zz", probe])]) == after


def test_bloom_survives_merge_of_other_buckets(spark, tbl):
    """Untouched buckets carry their manifest entries (blooms included)
    across merges; rewritten buckets lose them until the next analyze."""
    tbl.append(_df(spark, [("a", 1, "x"), ("b", 2, "y")]))
    tbl.analyze(bloom_cols=["k"])
    with_bloom = {f["path"] for f in tbl.snapshot()["files"] if f.get("blooms")}
    assert with_bloom
    tbl.merge_upsert(_df(spark, [("a", 10, "x2")]))
    kept = {f["path"] for f in tbl.snapshot()["files"] if f.get("blooms")}
    # every surviving pre-merge file kept its bloom
    assert kept == with_bloom & {f["path"] for f in tbl.snapshot()["files"]}
    # analyze is idempotent for files that already carry the bloom
    v = tbl.analyze(bloom_cols=["k"])
    assert all(f.get("blooms") for f in tbl.snapshot()["files"])
    assert tbl.analyze(bloom_cols=["k"]) == v  # second run: no version bump


def test_bloom_determinism_and_portability():
    """Blooms are md5-derived: same values → identical base64 on any
    machine; membership honest for present keys (no false negatives)."""
    from linked_maps_spark.lakehouse import _bloom_build, _bloom_may_contain

    b1 = _bloom_build(["x", "y", None, 42])
    b2 = _bloom_build(["x", "y", None, 42])
    assert b1 == b2
    assert _bloom_may_contain(b1, "x") and _bloom_may_contain(b1, 42)
    # 1 KiB / 5 hashes / 3 keys: the fixture's absent probes must miss
    assert not _bloom_may_contain(b1, "absent-key-1")
    assert not _bloom_may_contain(b1, "absent-key-2")


def test_cluster_files_tightens_range_pruning(spark, tbl):
    """Sort-clustering rewrite: digests unchanged, range predicates skip
    files afterwards, the CDF across the rewrite is empty."""
    from linked_maps_spark.util import table_digest

    # interleaved value ranges across appends → every file spans ~all of v
    tbl.append(_df(spark, [(f"a{i}", i * 2, "x") for i in range(50)]))
    tbl.append(_df(spark, [(f"b{i}", i * 2 + 1, "y") for i in range(50)]))
    before_digest = table_digest(tbl.read())
    pred = [("v", "between", (10, 19))]
    kept_before = len(tbl.files_where(pred))
    n_files_before = len(tbl.snapshot()["files"])
    assert kept_before == n_files_before  # interleaved: bounds keep all

    v0 = tbl.version()
    tbl.cluster_files(["v"], files_per_bucket=4)
    assert tbl.snapshot()["operation"] == "cluster"
    assert table_digest(tbl.read()) == before_digest
    kept_after = len(tbl.files_where(pred))
    assert kept_after < len(tbl.snapshot()["files"])
    assert _rows(tbl.read_where(pred)) == _rows(
        tbl.read().filter(F.col("v").between(10, 19))
    )
    # layout-only: the change feed across the rewrite is empty
    assert tbl.changes(v0, tbl.version()).count() == 0


def test_bloom_rendering_unifies_numeric_types():
    """str(value) alone would make an int probe of a double column a false
    NEGATIVE (file wrongly pruned -> silently empty result).  Numerically
    equal int/float/Decimal/bool must collapse to one rendering; strings
    never alias numbers."""
    import decimal

    from linked_maps_spark.lakehouse import _bloom_build, _bloom_may_contain

    bl = _bloom_build([10.0, decimal.Decimal("7.50"), True, 42, "s"])
    for probe in (10, 10.0, decimal.Decimal("10"), decimal.Decimal("10.0")):
        assert _bloom_may_contain(bl, probe)
    for probe in (7.5, decimal.Decimal("7.5")):
        assert _bloom_may_contain(bl, probe)
    assert _bloom_may_contain(bl, True) and _bloom_may_contain(bl, 1)
    assert _bloom_may_contain(bl, 42) and _bloom_may_contain(bl, 42.0)
    assert not _bloom_may_contain(bl, "10")  # the STRING '10', not the number
    assert not _bloom_may_contain(bl, 11)


def test_bloom_double_column_probed_with_int(spark, tmp_path):
    """End-to-end: a DOUBLE merge key analyzed into blooms, point-probed
    with a python int — must keep the matching file (no false-negative
    prune) and still prune a truly absent key."""
    t = LakeTable.create(
        spark, str(tmp_path / "d"), "v double, s string", key_cols=["v"], n_buckets=1
    )
    t.append(spark.createDataFrame([(float(i), f"r{i}") for i in range(50)],
                                   "v double, s string"))
    t.append(spark.createDataFrame([(1000.0, "hit")], "v double, s string"))
    t.analyze(bloom_cols=["v"])
    assert t.files_where([("v", "=", 1000)])  # int literal, double column
    assert t.read_where([("v", "=", 1000)]).count() == 1
    assert t.files_where([("v", "=", 99999)]) == []
