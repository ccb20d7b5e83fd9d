"""Temporal join operators: as-of join, interval (range) join, hypertable
rollup.

The reference's query surface is purely relational+geometric; these are the
temporal operators a large-scale event/training-data pipeline needs that
vanilla Spark lacks as primitives (the task brief's "as-of join, range join,
hypertable rollup" custom-operator family).  Each is expressed as a
composition of built-in DataFrame ops — no UDF, no driver loop — with the
physical shape chosen for the 100 TB case, and each driver query carries an
exact DuckDB oracle (DuckDB has native ``ASOF JOIN`` and IEJoin range joins,
so the oracle exercises a genuinely independent implementation).

Scale notes
-----------
* **as-of join** — implemented as union-tag + one window pass, NOT as a
  join: both sides are unioned with a side tag, hash-partitioned by key and
  sorted by (time, tag) once, and the most recent right row is carried
  forward with ``last(..., ignorenulls=True)``.  One shuffle total, no
  join, no per-key python; skew maps to the window's hash partitioning.
  A sort-merge as-of join would shuffle both sides *and* buffer the right
  side; the carry-forward form streams.
* **range join** — Spark would plan a pure interval predicate as
  BroadcastNestedLoopJoin (quadratic).  We bin time to a fixed grid:
  intervals explode to the bins they cover (bounded by interval_len/bin),
  points map to exactly ONE bin, and the bin equi-join + exact residual
  filter yields each qualifying pair exactly once — no dedup pass.  The
  equi-join hashes; AQE handles hot bins.
* **hypertable rollup** — TimescaleDB-style continuous aggregate: the
  minute level aggregates raw events ONCE; hour re-aggregates minute; day
  re-aggregates hour.  Coarser levels never touch raw data (partial-agg
  reuse), which is what makes per-epoch incremental maintenance O(delta).
  All measures are decomposable (count/min/max/integer sum).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .util import load_table as _load, make_query_registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
ORACLES: dict[str, str]
QUERIES, ORACLES, query = make_query_registry()


# --------------------------------------------------------------- as-of join


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    strict: bool = False,
) -> DataFrame:
    """As-of join: attach to every ``left`` row the most recent ``right``
    row of the same ``key`` with ``right_time <= left_time`` (``<`` when
    ``strict``).  Left rows keep NULLs when no right row qualifies.

    Right payload columns (everything except ``key``/``right_time``) come
    back prefixed ``asof_``; ties among right rows at the same
    ``(key, right_time)`` are broken deterministically by keeping the row
    that is greatest under a struct ordering of the payload columns.

    Physical plan: union-tag + ONE window carry-forward — a single hash
    shuffle on ``key``, no join operator at all (see module docstring).
    """
    payload = [c for c in right.columns if c not in (key, right_time)]
    if not payload:
        raise ValueError("right side needs at least one payload column")

    # the matched right_time itself is carried back as asof_<right_time>.
    # Ties among right rows at the same (key, t) are broken INSIDE the
    # window ordering (__p ascending → the greatest payload struct is the
    # last carried), so the right side needs no dedup aggregate and the
    # whole operator is exactly one hash shuffle.
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.struct(
            *[F.col(c) for c in payload], F.col(right_time).alias(right_time)
        ).alias("__p"),
        # right rows sort before left at equal time for inclusive semantics,
        # after left for strict
        F.lit(1 if strict else -1).alias("__tag"),
    )
    payload = payload + [right_time]
    l = left.select(
        "*",
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__tag"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag", F.col("__p").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("__p"), ignorenulls=True).over(w)
    out = (
        u.withColumn("__c", carried)
        .filter(F.col("__tag") == 0)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("__c").getField(c).alias(f"asof_{c}") for c in payload],
        )
    )
    return out


@query(
    "events_asof_purchase",
    # DuckDB's native ASOF JOIN is the independent oracle implementation.
    # Right side deduped per (user, ts) by greatest (event_id) to make the
    # tie rule explicit on both engines; strict '>' excludes self-matches.
    """
    WITH p AS (
        SELECT user_id, ts, MAX(event_id) AS event_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts,
           p.event_id AS asof_event_id,
           CASE WHEN p.event_id IS NULL THEN NULL
                ELSE date_diff('microsecond', p.ts, e.ts) END AS micros_since_purchase
    FROM events e
    ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts > p.ts
    ORDER BY e.event_id
    """,
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event annotated with the user's most recent PRIOR purchase
    event and the exact microsecond gap (strict as-of: a purchase does not
    match itself)."""
    ev = _load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "event_id"
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases.select("user_id", "p_ts", "event_id"),
        key="user_id",
        left_time="ts",
        right_time="p_ts",
        strict=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id"),
        F.when(
            F.col("asof_event_id").isNull(), F.lit(None).cast("long")
        )
        .otherwise(
            # tz-independent exact integer gap (ts is TIMESTAMP_NTZ)
            F.expr("timestampdiff(MICROSECOND, asof_p_ts, ts)")
        )
        .alias("micros_since_purchase"),
    ).orderBy("event_id")


# ------------------------------------------------------------- range join


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    lo: str,
    hi: str,
    bin_micros: int = 3_600_000_000,
) -> DataFrame:
    """Interval containment join: pairs ``(point, interval)`` with
    ``lo <= point_time < hi`` — no equi key at all.

    Both sides map onto a fixed time grid (``bin_micros`` wide): a point
    lands in exactly one bin, an interval explodes to every bin it covers
    (``sequence``), the bin equi-join produces each qualifying pair exactly
    once, and the residual filter applies the exact bounds.  Pick
    ``bin_micros`` near the typical interval length so the explode factor
    stays ~1-2; Spark's native plan for this predicate is a nested-loop
    cross product.
    """
    # tz-FREE epoch micros (wall-clock since the NTZ epoch).  An LTZ cast
    # here would be non-injective across a DST spring-forward gap: a point
    # at a nonexistent wall time maps an hour ahead, can land in a bin past
    # the interval's last covered bin, and the pair is silently dropped
    # even though the exact residual predicate accepts it.
    us = lambda c: F.expr(  # noqa: E731
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({c} AS TIMESTAMP_NTZ))"
    )
    p = points.withColumn("__bin", F.floor(us(point_time) / F.lit(bin_micros)))
    # Degenerate intervals (hi <= lo) match nothing under lo <= t < hi, but
    # left in they would be a DoS: sequence(start, stop) defaults to step -1
    # when start > stop, so one corrupt row with swapped bounds explodes to
    # every bin DOWN to its hi — drop them before the explode.
    i = intervals.where(F.col(hi) > F.col(lo)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(us(lo) / F.lit(bin_micros)),
                # hi is exclusive: last covered bin is the one holding hi-1us
                F.floor((us(hi) - 1) / F.lit(bin_micros)),
            )
        ),
    )
    pairs = p.join(i, on="__bin").filter(
        (F.col(point_time) >= F.col(lo)) & (F.col(point_time) < F.col(hi))
    )
    return pairs.drop("__bin")


@query(
    "events_in_error_windows",
    # the oracle is DuckDB's IEJoin (native inequality join) — a genuinely
    # different physical strategy from the binned equi-join.
    """
    WITH w AS (
        SELECT event_id AS window_id, ts AS lo,
               ts + INTERVAL 30 MINUTE AS hi
        FROM events WHERE event_type = 'error' AND event_id % 7 = 0
    )
    SELECT w.window_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           MIN(e.event_id) AS first_event,
           MAX(e.event_id) AS last_event
    FROM w JOIN events e ON e.ts >= w.lo AND e.ts < w.hi
    GROUP BY w.window_id
    ORDER BY w.window_id
    """,
)
def events_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): all events falling inside the 30-min
    window opened by every 7th error event, aggregated per window."""
    ev = _load(spark, sf_dir, "events")
    windows = (
        ev.filter((F.col("event_type") == "error") & (F.col("event_id") % 7 == 0))
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
        )
    )
    pairs = range_join_binned(
        ev.select("event_id", "user_id", "ts"), windows, "ts", "lo", "hi"
    )
    return (
        pairs.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("window_id")
    )


# -------------------------------------------------------- hypertable rollup

#: decomposable measures carried by every rollup level.  value is DOUBLE in
#: the source; FLOOR(value*1000) is the same single IEEE op on both engines,
#: so the sum is exact-integer and order-independent.
_MEASURES = ("n_events", "sum_value_milli", "min_value_milli", "max_value_milli")


# --------------------------------------------------- gap-fill + LOCF


def gapfill_locf(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    bucket_seconds: int = 21600,
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Time-bucket gap-filling with last-observation-carried-forward — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` pair, Spark-first.

    Per key: every ``bucket_seconds`` bucket between the key's first and
    last event exists in the output (``sequence`` + explode — generated,
    never joined against a calendar table), carrying the event count (0 in
    gaps) and the latest observed ``value`` at-or-before the bucket (one
    ``last(ignorenulls)`` running window).  Bucket arithmetic is tz-free
    integer math (the sessionize convention); the in-bucket "latest" tie
    rule is the portable zero-padded (micros, event_id) string, identical
    on both engines.  Cost: one groupBy shuffle + one window over the same
    key partitioning — Spark reuses the exchange; the explode output is
    bounded by time-span/bucket, not event count."""
    micros = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({time_col} AS TIMESTAMP_NTZ))"
    )
    bkt = F.floor(F.floor(micros / 1_000_000) / bucket_seconds)
    ord_key = F.concat(
        F.lpad(micros.cast("string"), 20, "0"),
        F.lpad(F.col(order_col).cast("string"), 12, "0"),
    )
    agg = (
        events.select(
            F.col(key), bkt.alias("bucket_no"),
            # NULL-valued observations are invisible to LOCF on BOTH engines
            # (DuckDB's arg_max skips NULL args; nulling the ordering key
            # makes max_by skip them identically) — they still count in
            # n_events
            F.when(F.col(value_col).isNotNull(), ord_key).alias("__ord"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key, "bucket_no")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max_by("__v", F.col("__ord")).alias("__last"),
        )
    )
    series = (
        agg.groupBy(key)
        .agg(F.min("bucket_no").alias("__lo"), F.max("bucket_no").alias("__hi"))
        .select(
            key,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket_no"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        series.join(agg, [key, "bucket_no"], "left")
        .select(
            key,
            "bucket_no",
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_events"),
            F.last("__last", ignorenulls=True).over(w).alias("value_locf"),
        )
        .orderBy(key, "bucket_no")
    )


@query(
    "events_gapfill_locf",
    # DuckDB derives the same series with its native generate_series +
    # arg_max + IGNORE NULLS window — an independent gapfill implementation
    """
    WITH e AS (
        SELECT user_id, event_id, value, ts,
               date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                   // 21600 AS bkt,
               lpad(CAST(date_diff('microsecond',
                         TIMESTAMP '1970-01-01 00:00:00', ts) AS VARCHAR),
                    20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
        FROM events
    ),
    agg AS (
        SELECT user_id, bkt, COUNT(*) AS n_events,
               arg_max(value, ord_key) AS last_in_bucket
        FROM e GROUP BY user_id, bkt
    ),
    bounds AS (
        SELECT user_id, MIN(bkt) AS lo, MAX(bkt) AS hi FROM agg GROUP BY user_id
    ),
    series AS (
        SELECT user_id, unnest(generate_series(lo, hi)) AS bkt FROM bounds
    )
    SELECT s.user_id, s.bkt AS bucket_no,
           COALESCE(a.n_events, 0) AS n_events,
           last_value(a.last_in_bucket IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.bkt
                     ROWS UNBOUNDED PRECEDING) AS value_locf
    FROM series s LEFT JOIN agg a ON a.user_id = s.user_id AND a.bkt = s.bkt
    ORDER BY s.user_id, bucket_no
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour buckets per user with gaps filled and the last observed value
    carried forward — the dashboard-resampling query every hypertable
    serves."""
    return gapfill_locf(_load(spark, sf_dir, "events"))


# --------------------------------------------------------------- SCD Type 2


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    time_col: str,
    order_cols: list[str] | None = None,
    attrs: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history from a change stream: every
    change event becomes one dimension version with a ``[valid_from,
    valid_to)`` validity interval; the key's newest version has
    ``valid_to IS NULL`` and ``is_current = true``.

    The canonical read-side shape of a CDC pipeline (Delta/Iceberg
    APPLY CHANGES INTO … STORED AS SCD TYPE 2): downstream consumers join
    facts to the dimension version valid at the fact's event time.  ONE
    window shuffle on the entity key — interval assembly is lead()/
    row_number() over the key partition, no self-join; at 10^10 events the
    cost is exactly one hash exchange of the change stream.  Ties are
    broken by ``order_cols`` so versioning is deterministic under replay.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        time_col, *(order_cols or [])
    )
    nxt = F.lead(time_col).over(w)
    return changes.select(
        *key_cols,
        F.row_number().over(w).alias("version_no"),
        *(attrs or []),
        F.col(time_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "events_scd2_history",
    # lead()/row_number() in DuckDB over the identical (ts, event_id)
    # ordering — the independent derivation of the validity intervals
    """
    SELECT user_id,
           ROW_NUMBER() OVER w AS version_no,
           event_id, event_type AS state, value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version_no
    """,
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream read as SCD2 upserts of per-user state: each event
    opens a new dimension version and closes the previous one."""
    ev = _load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("event_type").alias("state"), "value", "ts"
    )
    out = scd2_history(
        ev,
        key_cols=["user_id"],
        time_col="ts",
        order_cols=["event_id"],
        attrs=["event_id", "state", "value"],
    )
    return out.orderBy("user_id", "version_no")


def _leaf_rollup(events: DataFrame, level: str) -> DataFrame:
    milli = F.floor(F.col("value") * 1000).cast("long")
    return events.groupBy(
        F.date_trunc(level, F.col("ts")).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(milli).alias("sum_value_milli"),
        F.min(milli).alias("min_value_milli"),
        F.max(milli).alias("max_value_milli"),
    )


def reaggregate(finer: DataFrame, level: str) -> DataFrame:
    """Roll a finer level up to ``level`` touching only the finer aggregate
    (never raw data) — the continuous-aggregate maintenance step."""
    return finer.groupBy(
        F.date_trunc(level, F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_milli").alias("sum_value_milli"),
        F.min("min_value_milli").alias("min_value_milli"),
        F.max("max_value_milli").alias("max_value_milli"),
    )


def hypertable_rollup(events: DataFrame, sort: bool = True) -> DataFrame:
    """Three-level continuous aggregate over the events hypertable:
    minute ← raw, hour ← minute, day ← hour (union-tagged by level).

    ``sort=False`` skips the presentation orderBy for callers that feed the
    result into another aggregation/merge (the incremental refresh), where
    a global sort is pure waste."""
    minute = _leaf_rollup(events, "minute")
    hour = reaggregate(minute, "hour")
    day = reaggregate(hour, "day")
    tag = lambda df, lvl: df.select(F.lit(lvl).alias("level"), "*")  # noqa: E731
    out = (
        tag(minute, "minute")
        .unionByName(tag(hour, "hour"))
        .unionByName(tag(day, "day"))
    )
    return out.orderBy("level", "bucket_ts") if sort else out


_ROLLUP_LEVEL_SQL = """
    SELECT '{lvl}' AS level, date_trunc('{lvl}', ts) AS bucket_ts,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
           MIN(CAST(FLOOR(value * 1000) AS BIGINT)) AS min_value_milli,
           MAX(CAST(FLOOR(value * 1000) AS BIGINT)) AS max_value_milli
    FROM events GROUP BY 2
"""


@query(
    "rollup_hypertable",
    # the oracle computes every level DIRECTLY from raw rows; the engine
    # computes coarser levels by re-aggregating finer ones — hash equality
    # proves the partial-aggregate decomposition is lossless.
    "SELECT * FROM ("
    + " UNION ALL ".join(
        _ROLLUP_LEVEL_SQL.format(lvl=lvl) for lvl in ("minute", "hour", "day")
    )
    + ") ORDER BY level, bucket_ts",
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hypertable_rollup(_load(spark, sf_dir, "events"))


# ------------------------------------- continuous rollup (lake-maintained)

ROLLUP_SCHEMA = (
    "level string, bucket_ts timestamp, n_events long, "
    "sum_value_milli long, min_value_milli long, max_value_milli long"
)


def create_rollup_table(spark: SparkSession, path: str, n_buckets: int = 8):
    """The materialized continuous-aggregate table (TimescaleDB caggs /
    Spark's missing incremental materialized view), keyed by
    ``(level, bucket_ts)`` and maintained by :func:`maintain_rollup`."""
    from .lakehouse import LakeTable

    return LakeTable.create(
        spark, path, ROLLUP_SCHEMA, key_cols=["level", "bucket_ts"],
        n_buckets=n_buckets,
    )


def maintain_rollup(events_tbl, rollup) -> int:
    """Incrementally refresh ``rollup`` with the events appended to
    ``events_tbl`` since the last refresh — O(delta + touched rollup rows),
    never a re-scan of event history.

    The refresh cursor (the events-table snapshot version last folded in)
    rides the rollup table's own commit summary, so the maintenance step is
    idempotent and crash-safe under the lakehouse's optimistic commits: a
    retried refresh sees the cursor of the last COMMITTED refresh.  The
    delta is read via the manifest diff (:meth:`LakeTable.read_appended` —
    only the new data files are opened), aggregated with the same
    decomposable measures as :func:`hypertable_rollup`, and combined with
    ONLY the already-materialized rows it touches (bucket-pruned read +
    broadcast semi-join on the delta's keys) before a keyed MERGE."""
    to_v = events_tbl.version()
    from_v = rollup.latest_summary_value("events_version")
    if from_v is None:
        from_v = 0
    if from_v >= to_v:
        return rollup.version()
    delta = events_tbl.read_appended(from_v, to_v)
    # cache: the delta rollup is consumed THREE times (buckets_for collect,
    # the broadcast-keys collect, and the union below) — without it each
    # consumer re-scans the delta files and re-runs the 3-level aggregation
    d = hypertable_rollup(delta, sort=False).cache()
    try:
        keys = F.broadcast(d.select("level", "bucket_ts").distinct())
        current = rollup.read(buckets=rollup.buckets_for(d)).join(
            keys, ["level", "bucket_ts"], "left_semi"
        )
        combined = (
            current.unionByName(d)
            .groupBy("level", "bucket_ts")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_milli").alias("sum_value_milli"),
                F.min("min_value_milli").alias("min_value_milli"),
                F.max("max_value_milli").alias("max_value_milli"),
            )
        )
        return rollup.merge_upsert(combined, summary={"events_version": to_v})
    finally:
        d.unpersist(blocking=False)


# ------------------------------------------- lake-maintained SCD2 dimension

SCD2_SCHEMA = (
    "user_id long, version_no int, event_id long, state string, "
    "value double, valid_from timestamp, valid_to timestamp, "
    "is_current boolean"
)


def create_scd2_table(spark: SparkSession, path: str, n_buckets: int = 8):
    """The persisted SCD Type-2 dimension maintained by
    :func:`maintain_scd2`.  MERGE identity is ``(user_id, version_no)``
    (a maintenance pass updates the closed current row and inserts new
    versions); files bucket by ``user_id`` alone so a refresh prunes to the
    touched keys' buckets."""
    from .lakehouse import LakeTable

    return LakeTable.create(
        spark, path, SCD2_SCHEMA, key_cols=["user_id", "version_no"],
        bucket_cols=["user_id"], n_buckets=n_buckets,
    )


def maintain_scd2(events_tbl, dim) -> int:
    """Incrementally extend the SCD2 dimension with the events appended to
    ``events_tbl`` since the last refresh — the north rule's
    "incrementally, not by full rebuild": O(delta + touched keys' current
    rows), never a re-scan of change history.

    Same cursor discipline as :func:`maintain_rollup` (events-table version
    in the dimension's commit summary → idempotent, crash-safe).  Per
    touched key, the delta's events become versions ``base+1..base+n`` and
    the previously-current row closes at the delta's first ``valid_from``;
    untouched keys are never read.  Requires batches append in event-time
    order per key (the WAL contract); a delta event older than its key's
    open interval raises rather than silently corrupting history."""
    to_v = events_tbl.version()
    from_v = dim.latest_summary_value("events_version")
    if from_v is None:
        from_v = 0
    if from_v >= to_v:
        return dim.version()
    delta = (
        events_tbl.read_appended(from_v, to_v)
        .select(
            "user_id", "event_id", F.col("event_type").alias("state"),
            "value", "ts",
        )
        .cache()
    )
    open_rows = None
    try:
        keys = F.broadcast(delta.select("user_id").distinct())
        touched = dim.read(buckets=dim.buckets_for(delta)).join(
            keys, ["user_id"], "left_semi"
        )
        # consumed three times (late guard, version base, closed rows) —
        # cache like delta so the dim buckets are scanned once
        open_rows = touched.filter(F.col("is_current")).cache()
        # the ordering contract is the (ts, event_id) TUPLE — scd2_history's
        # window order — so a delta event tying the open interval's ts with
        # a smaller event_id is just as out-of-order as an older ts
        late = (
            delta.join(
                open_rows.select(
                    "user_id",
                    F.col("valid_from").alias("cur_from"),
                    F.col("event_id").alias("cur_eid"),
                ),
                "user_id",
            )
            .filter(
                (F.col("ts") < F.col("cur_from"))
                | (
                    (F.col("ts") == F.col("cur_from"))
                    & (F.col("event_id") <= F.col("cur_eid"))
                )
            )
            .limit(1)
            .count()
        )
        if late:
            raise ValueError(
                "maintain_scd2: delta contains events at or before an open "
                "dimension interval's (ts, event_id) position (batches must "
                "append in per-key event-time order)"
            )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        base = open_rows.select("user_id", F.col("version_no").alias("base_no"))
        nxt = F.lead("ts").over(w)
        new_rows = (
            delta.join(F.broadcast(base), "user_id", "left")
            .select(
                "user_id",
                (F.coalesce(F.col("base_no"), F.lit(0)) + F.row_number().over(w))
                .cast("int")
                .alias("version_no"),
                "event_id", "state", "value",
                F.col("ts").alias("valid_from"),
                nxt.alias("valid_to"),
                nxt.isNull().alias("is_current"),
            )
        )
        first_new = delta.groupBy("user_id").agg(F.min("ts").alias("new_from"))
        closed = (
            open_rows.drop("valid_to", "is_current")
            .join(F.broadcast(first_new), "user_id")
            .select(
                "user_id", "version_no", "event_id", "state", "value",
                "valid_from",
                F.col("new_from").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )
        return dim.merge_upsert(
            closed.unionByName(new_rows),
            summary={"events_version": to_v},
            assume_unique=True,  # (user_id, version_no) unique by construction
        )
    finally:
        delta.unpersist(blocking=False)
        if open_rows is not None:
            open_rows.unpersist(blocking=False)
