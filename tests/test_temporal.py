"""Temporal operators: as-of join, binned range join, hypertable rollup.

Value checks run against naive python recomputes and DuckDB's native
temporal operators (ASOF JOIN / IEJoin); plan checks pin the physical
shapes the module promises (no join in the as-of plan, no cartesian in the
range join).
"""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from linked_maps_spark import temporal

SF = "/root/testdata/sf0.001"


def _ts(day, h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, day, h, m, s, us)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    """Classic as-of fixture: trades matched to the latest prior quote."""
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(1, 9, 30)),
            (2, "A", _ts(1, 10, 0)),
            (3, "A", _ts(1, 10, 0, 0, 1)),
            (4, "B", _ts(1, 9, 0)),  # before any B quote
            (5, "B", _ts(1, 12, 0)),
            (6, "C", _ts(1, 12, 0)),  # key with no quotes at all
        ],
        "trade_id long, sym string, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1, 9, 0), 100),
            ("A", _ts(1, 10, 0), 101),  # exactly at trade 2's time
            ("A", _ts(1, 10, 0), 99),   # same-timestamp tie → max struct wins
            ("B", _ts(1, 11, 0), 200),
        ],
        "sym string, qt timestamp, px long",
    )
    return trades, quotes


def test_asof_inclusive_and_strict_semantics(spark, quotes_trades):
    trades, quotes = quotes_trades
    inc = {
        r["trade_id"]: r["asof_px"]
        for r in temporal.asof_join(trades, quotes, "sym", "t", "qt").collect()
    }
    # trade 2 at exactly 10:00 sees the 10:00 quote (inclusive); the
    # same-time tie resolves to the greatest payload struct (px=101)
    assert inc == {1: 100, 2: 101, 3: 101, 4: None, 5: 200, 6: None}
    strict = {
        r["trade_id"]: r["asof_px"]
        for r in temporal.asof_join(
            trades, quotes, "sym", "t", "qt", strict=True
        ).collect()
    }
    # strict: trade 2 must NOT see the 10:00 quote
    assert strict == {1: 100, 2: 100, 3: 101, 4: None, 5: 200, 6: None}


def test_asof_carries_matched_right_time(spark, quotes_trades):
    trades, quotes = quotes_trades
    row = (
        temporal.asof_join(trades, quotes, "sym", "t", "qt")
        .filter("trade_id = 5")
        .collect()[0]
    )
    assert row["asof_qt"] == _ts(1, 11, 0)


def test_asof_plan_has_no_join(spark, quotes_trades):
    """The whole as-of is one window over a union — no join operator, so
    exactly one hash shuffle on the key."""
    trades, quotes = quotes_trades
    plan = (
        temporal.asof_join(trades, quotes, "sym", "t", "qt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_duckdb_asof_join(spark):
    """Cross-engine on real data: the driver query vs DuckDB ASOF JOIN."""
    got = temporal.events_asof_purchase(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.execute(temporal.ORACLES["events_asof_purchase"]).df()
    assert len(got) == len(want) > 0
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    assert g["asof_event_id"].astype("float").equals(w["asof_event_id"].astype("float"))
    assert (
        g["micros_since_purchase"].astype("float").equals(
            w["micros_since_purchase"].astype("float")
        )
    )


def test_range_join_binned_equals_cross_filter(spark):
    """Binned pairing ≡ the quadratic reference plan, across bin sizes that
    do and don't divide the interval length."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "ts")
    iv = (
        ev.filter(F.col("event_id") % 11 == 0)
        .select(
            F.col("event_id").alias("iv_id"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 47 MINUTES")).alias("hi"),
        )
    )
    ref = (
        ev.crossJoin(iv)
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .select("event_id", "iv_id")
    )
    want = {(r["event_id"], r["iv_id"]) for r in ref.collect()}
    assert want  # fixture produces real pairs
    for bin_us in (3_600_000_000, 1_000_000_000, 47 * 60 * 1_000_000):
        got = {
            (r["event_id"], r["iv_id"])
            for r in temporal.range_join_binned(
                ev, iv, "ts", "lo", "hi", bin_micros=bin_us
            )
            .select("event_id", "iv_id")
            .collect()
        }
        assert got == want, f"bin={bin_us}"


def test_range_join_plan_is_equi_join(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "ts")
    iv = ev.limit(5).select(
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    plan = (
        temporal.range_join_binned(ev, iv, "ts", "lo", "hi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_range_join_boundary_exactness(spark):
    """lo inclusive, hi exclusive, down to the microsecond."""
    pts = spark.createDataFrame(
        [
            (1, _ts(1, 10, 0, 0, 0)),        # == lo → in
            (2, _ts(1, 10, 29, 59, 999999)),  # hi-1us → in
            (3, _ts(1, 10, 30, 0, 0)),        # == hi → out
            (4, _ts(1, 9, 59, 59, 999999)),   # lo-1us → out
        ],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, _ts(1, 10, 0), _ts(1, 10, 30))], "iv_id long, lo timestamp, hi timestamp"
    )
    got = {
        r["pid"]
        for r in temporal.range_join_binned(pts, iv, "ts", "lo", "hi").collect()
    }
    assert got == {1, 2}


def test_rollup_reaggregation_is_lossless(spark):
    """hour-from-minute ≡ hour-from-raw (the continuous-aggregate claim)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    minute = temporal._leaf_rollup(ev, "minute")
    via_minute = temporal.reaggregate(minute, "hour").orderBy("bucket_ts")
    direct = temporal._leaf_rollup(ev, "hour").orderBy("bucket_ts")
    assert via_minute.collect() == direct.collect()


def test_rollup_incremental_merge(spark):
    """Continuous-aggregate maintenance: rollup(old) ⊕ rollup(delta) ≡
    rollup(old ∪ delta), per level — O(delta) epoch updates are sound."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    old = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    merged = temporal.reaggregate(
        temporal._leaf_rollup(old, "minute").unionByName(
            temporal._leaf_rollup(delta, "minute")
        ),
        "minute",
    )
    full = temporal._leaf_rollup(ev, "minute")
    assert merged.orderBy("bucket_ts").collect() == full.orderBy("bucket_ts").collect()


def test_gapfill_locf_values(spark):
    """Hand fixture: buckets 0,1,4 observed → 2,3 generated with n_events=0
    and the bucket-1 value carried forward; in-bucket 'latest' follows the
    (ts, event_id) rule."""
    rows = [
        (1, _ts(1, 0, 5), 7, "a", 10.0),    # bucket 0 (6h buckets)
        (2, _ts(1, 7, 0), 7, "a", 20.0),    # bucket 1
        (3, _ts(1, 7, 0), 7, "a", 25.0),    # bucket 1, same ts, higher id wins
        (5, _ts(1, 7, 30), 7, "a", None),   # bucket 1, latest but NULL value:
                                            # counted, invisible to LOCF
        (4, _ts(2, 1, 0), 7, "a", 99.0),    # bucket 4 (25h = bucket 4)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = temporal.gapfill_locf(ev).collect()
    by_b = {r["bucket_no"] - got[0]["bucket_no"]: r for r in got}
    assert sorted(by_b) == [0, 1, 2, 3, 4]
    assert by_b[2]["n_events"] == 0 and by_b[3]["n_events"] == 0
    assert by_b[1]["n_events"] == 3               # NULL observation counted
    assert by_b[1]["value_locf"] == 25.0          # …but invisible to LOCF;
                                                  # same-ts tie → max event_id
    assert by_b[2]["value_locf"] == 25.0 == by_b[3]["value_locf"]  # locf
    assert by_b[4]["value_locf"] == 99.0
    assert by_b[0]["value_locf"] == 10.0


def test_scd2_history_interval_chain(spark):
    """Per key: versions are 1..n, intervals chain exactly (valid_to ==
    next valid_from), exactly ONE current version, and a point-in-time
    lookup at any event time hits exactly one version."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    hist = temporal.scd2_history(
        ev.select("user_id", "event_id", "event_type", "value", "ts"),
        key_cols=["user_id"],
        time_col="ts",
        order_cols=["event_id"],
        attrs=["event_id", "event_type"],
    ).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["user_id"], []).append(r)
    assert len(hist) == ev.count()
    for rows in by_key.values():
        rows.sort(key=lambda r: r["version_no"])
        assert [r["version_no"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert not a["is_current"]
    # point-in-time: the version valid at each row's own valid_from is itself
    some = by_key[next(iter(by_key))]
    for probe in some:
        hits = [
            r for r in some
            if r["valid_from"] <= probe["valid_from"]
            and (r["valid_to"] is None or probe["valid_from"] < r["valid_to"])
        ]
        assert [h["version_no"] for h in hits] == [probe["version_no"]]


def test_temporal_driver_queries_match_duckdb(spark):
    import hashlib

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")

    def h(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
        return hashlib.sha256(df.astype(str).to_csv(index=False).encode()).hexdigest()

    for name in ("events_in_error_windows", "rollup_hypertable"):
        got = temporal.QUERIES[name](spark, SF).toPandas()
        want = con.execute(temporal.ORACLES[name]).df()
        assert h(got) == h(want), name


def test_continuous_rollup_incremental_refresh(spark, tmp_path):
    """Lake-maintained continuous aggregate: three appends, three
    incremental refreshes — the materialized table always equals the
    from-scratch rollup, the cursor survives in the commit summary, and a
    refresh with no new events is a no-op (no version bump)."""
    from linked_maps_spark.lakehouse import LakeTable

    ev_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events_tbl = LakeTable.create(
        spark, str(tmp_path / "ev"), ev_schema, key_cols=[], n_buckets=1
    )
    rollup = temporal.create_rollup_table(spark, str(tmp_path / "ru"), n_buckets=4)
    full = spark.read.parquet(f"{SF}/events.parquet")

    slices = [
        full.filter(F.col("event_id") % 3 == i).select(*events_tbl.schema().names)
        for i in range(3)
    ]
    seen = None
    for i, sl in enumerate(slices):
        events_tbl.append(sl)
        v = temporal.maintain_rollup(events_tbl, rollup)
        assert rollup.latest_summary_value("events_version") == events_tbl.version()
        seen = sl if seen is None else seen.unionByName(sl)
        want = temporal.hypertable_rollup(seen).collect()
        got = rollup.read().orderBy("level", "bucket_ts").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], f"refresh {i}"
    # idempotent: nothing new appended → no new snapshot
    assert temporal.maintain_rollup(events_tbl, rollup) == v
    assert rollup.version() == v


def test_scd2_incremental_maintenance_equals_from_scratch(spark, tmp_path):
    """Lake-maintained SCD2: time-ordered change batches applied
    incrementally always equal the from-scratch history over everything
    seen; replayed refreshes are no-ops; out-of-order batches raise."""
    from linked_maps_spark.lakehouse import LakeTable
    from linked_maps_spark.util import table_digest

    ev_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events_tbl = LakeTable.create(
        spark, str(tmp_path / "ev"), ev_schema, key_cols=[], n_buckets=1
    )
    dim = temporal.create_scd2_table(spark, str(tmp_path / "dim"), n_buckets=4)
    full = (
        spark.read.parquet(f"{SF}/events.parquet")
        .orderBy("ts", "event_id")
        .limit(300)
        .collect()
    )
    cuts = [0, 100, 180, 300]  # time-ordered batches of uneven width
    seen: list = []
    for lo, hi in zip(cuts, cuts[1:]):
        batch = spark.createDataFrame(full[lo:hi], ev_schema)
        events_tbl.append(batch.select(*events_tbl.schema().names))
        v = temporal.maintain_scd2(events_tbl, dim)
        seen.extend(full[lo:hi])
        want = temporal.scd2_history(
            spark.createDataFrame(seen, ev_schema).select(
                "user_id", "event_id", F.col("event_type").alias("state"),
                "value", "ts",
            ),
            key_cols=["user_id"],
            time_col="ts",
            order_cols=["event_id"],
            attrs=["event_id", "state", "value"],
        ).select(*dim.schema().names)
        assert table_digest(dim.read()) == table_digest(want)
    # idempotent: no new events → no version bump
    assert temporal.maintain_scd2(events_tbl, dim) == v
    assert dim.version() == v
    # out-of-order batch (older than open intervals) must raise, not corrupt
    stale = spark.createDataFrame(full[:5], ev_schema)
    events_tbl.append(stale.select(*events_tbl.schema().names))
    with pytest.raises(ValueError, match="event-\\s*time order|event-"):
        temporal.maintain_scd2(events_tbl, dim)


def test_scd2_maintenance_rejects_ts_tie_with_smaller_event_id(spark, tmp_path):
    """The ordering contract is the (ts, event_id) tuple: an event tying the
    open interval's ts but carrying a SMALLER event_id would be ordered
    before it by scd2_history — incremental apply must raise, not silently
    produce a version order from-scratch can never yield."""
    import datetime as dt

    from linked_maps_spark.lakehouse import LakeTable

    ev_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events_tbl = LakeTable.create(
        spark, str(tmp_path / "ev"), ev_schema, key_cols=[], n_buckets=1
    )
    dim = temporal.create_scd2_table(spark, str(tmp_path / "dim"), n_buckets=2)
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    events_tbl.append(
        spark.createDataFrame([(10, t, 1, "signup", 1.0, "{}")], ev_schema)
    )
    temporal.maintain_scd2(events_tbl, dim)
    # same ts, smaller event_id → ordered BEFORE the open version
    events_tbl.append(
        spark.createDataFrame([(5, t, 1, "error", 2.0, "{}")], ev_schema)
    )
    with pytest.raises(ValueError, match="event-time order"):
        temporal.maintain_scd2(events_tbl, dim)
    # but same ts with a LARGER event_id is legal (zero-width interval,
    # exactly what from-scratch produces) and must still match it
    from linked_maps_spark.util import table_digest

    dim2 = temporal.create_scd2_table(spark, str(tmp_path / "dim2"), n_buckets=2)
    ev2 = LakeTable.create(
        spark, str(tmp_path / "ev2"), ev_schema, key_cols=[], n_buckets=1
    )
    ev2.append(spark.createDataFrame([(10, t, 1, "signup", 1.0, "{}")], ev_schema))
    temporal.maintain_scd2(ev2, dim2)
    ev2.append(spark.createDataFrame([(11, t, 1, "error", 2.0, "{}")], ev_schema))
    temporal.maintain_scd2(ev2, dim2)
    want = temporal.scd2_history(
        spark.createDataFrame(
            [(10, t, 1, "signup", 1.0, "{}"), (11, t, 1, "error", 2.0, "{}")],
            ev_schema,
        ).select(
            "user_id", "event_id", F.col("event_type").alias("state"),
            "value", "ts",
        ),
        key_cols=["user_id"], time_col="ts", order_cols=["event_id"],
        attrs=["event_id", "state", "value"],
    ).select(*dim2.schema().names)
    assert table_digest(dim2.read()) == table_digest(want)


def test_stream_scd2_equals_batch_and_survives_restart(spark, tmp_path):
    """Streaming SCD2 maintenance over a landing directory: drain, land
    more files, drain again — the dimension always equals the from-scratch
    history; a restart with nothing new is a no-op (both cursors hold)."""
    import os

    from linked_maps_spark import streaming, temporal as T
    from linked_maps_spark.lakehouse import LakeTable
    from linked_maps_spark.util import table_digest

    ev_schema = streaming.EVENTS_SCHEMA
    land = str(tmp_path / "land")
    os.makedirs(land)
    ckpt = str(tmp_path / "ckpt")
    events_tbl = LakeTable.create(
        spark, str(tmp_path / "ev"), ev_schema, key_cols=[], n_buckets=1
    )
    dim = temporal.create_scd2_table(spark, str(tmp_path / "dim"), n_buckets=4)

    full = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("ts", "event_id")
        .limit(240)
        .collect()
    )

    def land_slice(lo, hi, name):
        spark.createDataFrame(full[lo:hi], ev_schema).coalesce(1).write.parquet(
            os.path.join(land, name)
        )

    seen = 0
    for i, hi in enumerate((90, 240)):
        land_slice(seen, hi, f"s{i}")
        streaming.stream_scd2(spark, land + "/*", events_tbl, dim, ckpt)
        seen = hi
        want = T.scd2_history(
            spark.createDataFrame(full[:hi], ev_schema).select(
                "user_id", "event_id", F.col("event_type").alias("state"),
                "value", "ts",
            ),
            key_cols=["user_id"],
            time_col="ts",
            order_cols=["event_id"],
            attrs=["event_id", "state", "value"],
        ).select(*dim.schema().names)
        assert table_digest(dim.read()) == table_digest(want)
    # restart with no new files: no appends, no dim version bump
    ev_v, dim_v = events_tbl.version(), dim.version()
    streaming.stream_scd2(spark, land + "/*", events_tbl, dim, ckpt)
    assert (events_tbl.version(), dim.version()) == (ev_v, dim_v)
    # a FRESH checkpoint against the same table restarts batch numbering:
    # must raise (checkpoint/table mismatch), never silently drop batches
    import pyspark.errors

    with pytest.raises(
        (ValueError, pyspark.errors.exceptions.base.PySparkException),
        match="refusing batches|STREAM_FAILED|FOREACH",
    ):
        streaming.stream_scd2(
            spark, land + "/*", events_tbl, dim, str(tmp_path / "ckpt2")
        )
    assert (events_tbl.version(), dim.version()) == (ev_v, dim_v)


def test_range_join_binned_is_dst_proof(spark):
    """Bin arithmetic must be tz-free: under a DST session timezone an
    LTZ-cast epoch is non-injective (a point at a nonexistent spring-forward
    wall time maps an hour ahead), which used to drop pairs the exact
    residual predicate accepts."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # 2024-03-10 02:00-03:00 does not exist on the NY wall clock
        pts = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 3, 10, 2, 30)),   # inside the DST gap
                (2, dt.datetime(2024, 3, 10, 1, 59)),
                (3, dt.datetime(2024, 3, 10, 3, 1)),
            ],
            "pid long, ts timestamp_ntz",
        )
        iv = spark.createDataFrame(
            [(10, dt.datetime(2024, 3, 10, 2, 0), dt.datetime(2024, 3, 10, 3, 0))],
            "iv_id long, lo timestamp_ntz, hi timestamp_ntz",
        )
        got = {
            (r["pid"], r["iv_id"])
            for r in temporal.range_join_binned(
                pts, iv, "ts", "lo", "hi", bin_micros=3_600_000_000
            )
            .select("pid", "iv_id")
            .collect()
        }
        assert got == {(1, 10)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_event_sessionize_gap_is_dst_proof(spark, tmp_path):
    """The 6h session gap is wall-clock (matching DuckDB's naive-timestamp
    date_diff), not instant-based: a 6h30m wall gap spanning spring-forward
    must START a new session even when only 5h30m of real time elapsed."""
    import duckdb as _duck
    import pyarrow as pa
    import pyarrow.parquet as pq

    from linked_maps_spark import relational

    rows = [
        (1, dt.datetime(2024, 3, 10, 1, 30), 7, "view", 0.0, ""),
        (2, dt.datetime(2024, 3, 10, 8, 0), 7, "view", 0.0, ""),  # +6h30m wall
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = {
            r["event_id"]: r["session_id"]
            for r in relational.QUERIES["event_sessionize"](
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path / 'events.parquet'}'"
    )
    want = {
        r[0]: r[2]
        for r in con.execute(relational.ORACLES["event_sessionize"]).fetchall()
    }
    assert got == want == {1: 1, 2: 2}


def test_range_join_drops_degenerate_intervals_before_explode(spark):
    """hi <= lo matches nothing under lo <= t < hi — but without the guard,
    sequence(start, stop) steps -1 when start > stop, so one corrupt row
    with swapped bounds would explode to every bin down to hi (a DoS).  The
    guard must drop such rows BEFORE the explode, visibly in the plan."""
    import re

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 0, 0))], "event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            # swapped bounds spanning ~54 years of 1h bins if exploded
            (1, dt.datetime(2024, 6, 1), dt.datetime(1970, 1, 1)),
            # empty interval (hi == lo)
            (2, dt.datetime(2024, 6, 1), dt.datetime(2024, 6, 1)),
        ],
        "iv_id long, lo timestamp, hi timestamp",
    )
    out = temporal.range_join_binned(ev, iv, "ts", "lo", "hi")
    assert out.count() == 0
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"hi#\d+ > lo#\d+", plan), plan
