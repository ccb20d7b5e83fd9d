"""Relational operator suite over the driver's TPC-H-ish tables.

Each query exercises one operator family from SURVEY.md §2 on non-geometric
data, paired with a DuckDB oracle SQL string (driver contract,
``__spark_entry__.py``).  Conventions that keep Spark and DuckDB value-hash
identical:

* money math in DECIMAL(18,2) (exact), final aggregates cast to DOUBLE;
* every computed column aliased identically on both sides;
* all orderings carry a unique tie-break column;
* no raw DOUBLE summation (min/max/count are safe).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .util import load_table as load, make_query_registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
ORACLES: dict[str, str]
QUERIES, ORACLES, query = make_query_registry()


def _dec(col):
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------- A: aggs

@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 pattern: scan→filter→partial/final hash agg (SURVEY.md §2.4).

    Catalyst plan check: filter and the 5-column projection push into the
    parquet scan; whole-stage codegen covers scan→agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "top_orders_by_revenue",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders_by_revenue(spark, sf_dir):
    """TPC-H Q3 pattern: 3-way join → agg → deterministic top-k.

    Join order: orders ⋈ broadcast(BUILDING customers) FIRST, then the
    surviving order keys (a single bigint column, ~1/5 of orders) broadcast
    to lineitem — the fact table is never shuffled and non-qualifying
    lineitem rows die at the first join probe.  The old shape broadcast the
    ENTIRE orders key set to lineitem and applied the customer filter only
    after that join: 5× the broadcast bytes and 5× the rows surviving into
    the second join for identical results (both joins are FK equi-joins on
    unique keys, so reordering never changes multiplicity)."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem")
    bo = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey")
    )
    return (
        l.join(F.broadcast(bo), l.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "nation_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation ASC
    """,
)
def nation_revenue(spark, sf_dir):
    """Star join with broadcast dims (J2 analog): fact ⋈ 3 small dims."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


# ------------------------------------------------------- anti/semi joins

@query(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    ORDER BY c.c_custkey
    """,
)
def customers_without_orders(spark, sf_dir):
    """The leaf test as a relational anti-join (P8/J5, ui/main.py FILTER NOT
    EXISTS): customers with no *recent* order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "customers_single_priority",
    """
    SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) = 1
    ORDER BY c_custkey
    """,
)
def customers_single_priority(spark, sf_dir):
    """A5 / UI query 2 pattern: GROUP BY … HAVING COUNT(DISTINCT x) = 1.

    COUNT(DISTINCT) = 1 is evaluated as ``min(x) = max(x)`` — exactly
    equivalent for every input (both ignore NULLs; an all-NULL group yields
    a NULL comparison, dropped by the filter just as distinct-count 0 ≠ 1
    is), but it aggregates in ONE pass: Spark plans countDistinct alongside
    count(*) as two stacked aggregates with two exchanges (partial by
    (key, x), dedup, re-agg by key); min/max fold into the same partial agg
    as the count, halving the shuffles (plan: 3 Exchanges → 2)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderpriority").alias("_pmin"),
            F.max("o_orderpriority").alias("_pmax"),
        )
        .filter(F.col("_pmin") == F.col("_pmax"))
        .drop("_pmin", "_pmax")
        .orderBy("c_custkey")
    )


@query(
    "persisted_users",
    """
    SELECT DISTINCT a.user_id
    FROM events a
    WHERE EXISTS (SELECT 1 FROM events b
                  WHERE b.user_id = a.user_id AND b.event_type = 'click')
      AND EXISTS (SELECT 1 FROM events c
                  WHERE c.user_id = a.user_id AND c.event_type = 'purchase')
    ORDER BY user_id
    """,
)
def persisted_users(spark, sf_dir):
    """UI query 3 ('2 editions - similar') analog: entities present in both
    event classes — two semi-joins."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return (
        e.select("user_id").distinct()
        .join(clicks, "user_id", "left_semi")
        .join(buys, "user_id", "left_semi")
        .orderBy("user_id")
    )


@query(
    "retired_users",
    """
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE)
    FROM events WHERE event_type = 'purchase'
    ORDER BY user_id, day
    """,
)
def retired_users(spark, sf_dir):
    """UI query 4 ('2 editions - difference') analog: (user, day) entities
    present in edition 'click' but absent from edition 'purchase' — the
    MINUS as a left-anti join (J6)."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", day).distinct()
    buys = e.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return clicks.join(buys, ["user_id", "day"], "left_anti").orderBy("user_id", "day")


# --------------------------------------------------------------- windows

@query(
    "event_sequencing",
    """
    SELECT event_id, user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
    ORDER BY user_id, rn
    """,
)
def event_sequencing(spark, sf_dir):
    """§2.11 window gap: per-key change-event sequencing (row_number + lag),
    the modify-vs-add detector of the CDC pipeline."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .orderBy("user_id", "rn")
    )


@query(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC)
                   AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk
    """,
)
def top_orders_per_priority(spark, sf_dir):
    """Grouped top-k: the 3 highest-value orders inside every priority
    class — the per-key-top-N shape (row_number window + rank filter).
    Spark plans a WindowGroupLimit below the exchange (each map task keeps
    only its local top-3 per group before shuffling), so the sort never
    materializes whole groups — the property that keeps per-key top-N
    viable when one key holds 10^8 rows.  Deterministic under ties via the
    unique orderkey tie-break."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("o_orderpriority", "rnk")
    )


@query(
    "priority_price_median",
    # DuckDB derives the median with its NATIVE quantile_disc aggregate —
    # an independent implementation of the same lower-median-of-the-sorted-
    # multiset rule as the Spark window selection
    """
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS median_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def priority_price_median(spark, sf_dir):
    """EXACT per-group median (discrete: the lower-median ELEMENT of the
    sorted multiset, never an interpolated value — so doubles stay
    bit-identical to the oracle's quantile_disc).  One window shuffle on
    the group key; at 100-TB group sizes the approximate histogram sketch
    (sketch.py) is the first pass and this the exact refinement."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    cnt = Window.partitionBy("o_orderpriority")
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(cnt).alias("n_orders"),
        )
        .filter(F.col("__rn") == F.floor((F.col("n_orders") + 1) / 2))
        .select(
            "o_orderpriority",
            F.col("o_totalprice").alias("median_price"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "event_sessionize",
    """
    WITH t AS (
        SELECT event_id, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    f AS (
        SELECT event_id, user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 21600
                    THEN 1 ELSE 0 END AS new_session
        FROM t
    )
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM f
    ORDER BY user_id, event_id
    """,
)
def event_sessionize(spark, sf_dir):
    """Gap-based sessionization (6-hour inactivity threshold): lag + a
    conditional running sum — the standard event-stream session operator.
    Two windows over ONE partitioning (user_id), so Spark plans a single
    sort+shuffle; the gap test is exact integer epoch-seconds arithmetic,
    oracle-identical to DuckDB's date_diff.

    Gap arithmetic is deliberately tz-FREE: ``unix_timestamp`` would route
    the NTZ event time through the session timezone (a 6h30m wall gap
    across a spring-forward reads as 5h30m and merges sessions the oracle
    splits), so epoch seconds come from ``timestampdiff(MICROSECOND, ntz
    epoch, ts)`` — pure wall-clock integer math, like DuckDB's naive
    timestamps.  The floor-to-second difference equals DuckDB's
    ``date_diff('second')`` boundary count (which ``timestampdiff(SECOND)``
    — a truncated exact difference — would NOT for sub-second parts)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        )
        / F.lit(1_000_000)
    )
    e = e.withColumn("__sec", sec)
    gap = F.col("__sec") - F.lag("__sec").over(w)
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 21600), 1).otherwise(0).alias("new_session"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        flagged.select(
            "event_id",
            "user_id",
            F.sum("new_session").over(run).cast("long").alias("session_id"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "event_type_votes",
    """
    SELECT event_type, COUNT(*) AS votes
    FROM events
    GROUP BY event_type
    ORDER BY votes DESC, event_type ASC
    """,
)
def event_type_votes(spark, sf_dir):
    """A3/O1: vote counting + deterministic rank order
    (linked_maps_to_osm.py:153-168)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("votes"))
        .orderBy(F.desc("votes"), F.asc("event_type"))
    )


@query(
    "user_value_bbox",
    """
    SELECT user_id,
           MIN(value) AS min_value, MAX(value) AS max_value, COUNT(*) AS n
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_value_bbox(spark, sf_dir):
    """A4 bounding-box aggregate (min/max per key)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------------------- filters/set ops

@query(
    "segment_or_filter",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def segment_or_filter(spark, sf_dir):
    """P3 OR-list predicate → isin."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "orders_except_urgent",
    """
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_orderkey
    """,
)
def orders_except_urgent(spark, sf_dir):
    """U4 relational MINUS (ui/main.py:63) via except."""
    o = load(spark, sf_dir, "orders")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return f_orders.exceptAll(urgent).distinct().orderBy("o_orderkey")


@query(
    "status_priority_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def status_priority_rollup(spark, sf_dir):
    """ROLLUP hierarchy agg (SURVEY.md §2.11 'Catalyst-native if needed')."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "priority_status_pivot",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def priority_status_pivot(spark, sf_dir):
    """Pivot as portable conditional aggregation."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "priority_status_unpivot",
    # the inverse reshaping: DuckDB's native UNPIVOT over the pivoted CTE —
    # an independent melt implementation vs Spark's stack()
    """
    WITH p AS (
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status_col, n
    FROM p UNPIVOT (n FOR status_col IN (n_f, n_o, n_p))
    ORDER BY o_orderpriority, status_col
    """,
)
def priority_status_unpivot(spark, sf_dir):
    """UNPIVOT / melt: wide pivoted counts back to long form via
    ``stack()`` — the wide-to-long reshaping half the pivot family needs.
    Narrow-side expression only (3 literals per row), no extra shuffle
    beyond the pivot's own aggregation."""
    wide = priority_status_pivot(spark, sf_dir)
    return (
        wide.select(
            "o_orderpriority",
            F.expr(
                "stack(3, 'n_f', n_f, 'n_o', n_o, 'n_p', n_p) "
                "AS (status_col, n)"
            ),
        )
        .orderBy("o_orderpriority", "status_col")
    )


@query(
    "events_props_extract",
    # semi-structured path parity: DuckDB json_extract_string vs Spark
    # get_json_object over the same JSON column
    # json_valid + TRY_CAST reproduce get_json_object's null-on-failure
    # semantics (a malformed payload or non-numeric k must yield NULL on
    # both engines, never abort the oracle)
    """
    WITH e AS (
        SELECT event_type,
               CASE WHEN json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM e
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_extract(spark, sf_dir):
    """Semi-structured column handling: JSON path extraction out of the
    events ``props`` payload (``get_json_object``, JVM-side — the JSON scan
    never leaves the executor) feeding exact integer aggregates.  At scale
    the lesson is to extract ONCE into typed columns at ingest; this is the
    query-side fallback for payloads that stayed raw."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "promo_revenue_share",
    # TPC-H Q14 shape: part-type revenue share per ship month.  Sums are
    # exact DECIMAL cast to DOUBLE; the share divides those two identical
    # doubles (IEEE-deterministic on both engines) and rounds once.
    """
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_revenue,
           ROUND(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                 6) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 pattern: per-ship-month share of revenue from PROMO parts.
    ``part`` is the broadcast dim (small side); revenue math stays in exact
    DECIMAL until one final double division of identical operands."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
        "double"
    )
    total = F.sum(rev).cast("double")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
        )
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
            F.round(promo / total, 6).alias("promo_share"),
        )
        .orderBy("ship_month")
    )


@query(
    "event_session_stats",
    # session-level rollup of the gap sessionizer: same CTE chain, then one
    # GROUP BY (user, session) with exact integer duration
    """
    WITH t AS (
        SELECT event_id, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    f AS (
        SELECT event_id, user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 21600
                    THEN 1 ELSE 0 END AS new_session
        FROM t
    ),
    s AS (
        SELECT event_id, user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM f
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_micros
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def event_session_stats(spark, sf_dir):
    """Session-level rollup (count, bounds, exact duration) over the gap
    sessionizer — the per-session analytics table every event pipeline
    materializes.  The session-id windows and the rollup share ONE user_id
    hash partitioning, so Spark plans a single exchange end-to-end."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        )
        / F.lit(1_000_000)
    )
    e = e.withColumn("__sec", sec)
    gap = F.col("__sec") - F.lag("__sec").over(w)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.select(
        "user_id",
        "ts",
        F.sum(
            F.when(gap.isNull() | (gap > 21600), 1).otherwise(0)
        ).over(run).cast("long").alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .withColumn(
            "duration_micros",
            F.expr(
                "timestampdiff(MICROSECOND, CAST(session_start AS TIMESTAMP_NTZ), "
                "CAST(session_end AS TIMESTAMP_NTZ))"
            ),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "priority_status_cube",
    # full CUBE with explicit GROUPING flags (engine-portable, unlike the
    # engines' differing grouping_id bit orders); NULLS FIRST pinned on
    # both sides since ASC-NULLS defaults differ between Spark and DuckDB
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY g_pri, g_status,
             o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def priority_status_cube(spark, sf_dir):
    """CUBE: all four grouping-set combinations in one pass (Spark plans a
    single expand + aggregate — each input row fans to its grouping sets
    map-side, one shuffle total, vs four separate groupBys)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g_pri"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "g_pri", "g_status", "n_orders"
        )
        .orderBy(
            "g_pri", "g_status",
            F.asc_nulls_first("o_orderpriority"),
            F.asc_nulls_first("o_orderstatus"),
        )
    )


@query(
    "events_rolling_hour",
    # RANGE frame over integer epoch-seconds: DuckDB's native RANGE BETWEEN
    # is the independent sliding-window implementation
    """
    WITH e AS (
        SELECT event_id, user_id,
               date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        FROM events
    )
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM e
    ORDER BY user_id, event_id
    """,
)
def events_rolling_hour(spark, sf_dir):
    """Sliding event-time window (RANGE frame): per event, how many of the
    same user's events fall in the trailing hour — the rate-limit /
    burst-detection query.  The frame is VALUE-based (3600 seconds), not
    row-based, over tz-free integer epoch seconds; one window shuffle on
    the user key.  Counts only — exact on both engines."""
    e = load(spark, sf_dir, "events")
    sec = F.floor(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        )
        / F.lit(1_000_000)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        e.withColumn("__sec", sec)
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "order_priority_timeline",
    """
    SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS order_year,
           o_orderpriority,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_year, o_orderpriority
    """,
)
def order_priority_timeline(spark, sf_dir):
    """F5 year bucketing (strptime('%Y') analog) + two-level agg."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("year", "o_orderdate").cast("date").alias("order_year"),
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("order_year", "o_orderpriority")
    )


@query(
    "late_order_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def late_order_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-correlated semi-join feeding an aggregate —
    orders with at least one lineitem shipped > 60 days after order date,
    counted per priority.  The semi-join hashes on the order key with the
    date comparison as a residual condition (never re-multiplies orders by
    their matching lineitems, so the count needs no DISTINCT); date
    arithmetic is exact timestamps on both engines."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "large_volume_customers",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 350)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: aggregate → HAVING → join back to the dims.  The
    big-order keys are found with ONE partial-agg pass over lineitem; the
    tiny surviving key set left-semi-joins (AQE broadcasts it) to restrict
    orders/customer/lineitem BEFORE the re-aggregation, so the second pass
    touches only qualifying orders' rows — never re-aggregates the fact
    table.  Quantities sum in DECIMAL (exact cross-engine)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 350)
        .select("l_orderkey")
    )
    lk = l.join(big, "l_orderkey", "left_semi")
    return (
        lk.join(o, lk.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "important_parts",
    """
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS v
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name,
           CAST(pr.v AS DOUBLE) AS revenue
    FROM pr JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE pr.v * 1500 > (SELECT SUM(v) FROM pr)
    ORDER BY revenue DESC, p_partkey
    """,
)
def important_parts(spark, sf_dir):
    """TPC-H Q11 shape: per-group value filtered against a fraction of the
    GLOBAL total (parts whose revenue exceeds 1/1500 of all revenue).  The
    global total is a one-row aggregate cross-joined (broadcast) onto the
    per-part aggregates; the threshold compare stays in DECIMAL
    (``v · 1500 > total``) so the cut is exact integer arithmetic on both
    engines — no float-boundary row flips.  Per-part aggregation reuses
    the same shuffle for both the value and the filter."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pr = (
        l.groupBy(F.col("l_partkey"))
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).alias("v")
        )
    )
    total = pr.agg(F.sum("v").alias("t"))
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 1500 > F.col("t"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", F.col("v").cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
    )
