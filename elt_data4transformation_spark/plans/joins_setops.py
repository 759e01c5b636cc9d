"""Joins and set operations (SURVEY.md §2.3 J1-J12, §2.7).

Scale notes: dimension tables (region/nation/supplier) are broadcast
explicitly — at 100 TB the fact side never shuffles for these joins.
Semi/anti joins use left_semi/left_anti so Spark can plan broadcast
variants. The lateral-top-1 pattern pre-aggregates before the window so
the shuffled payload is |group keys|, not |rows|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .registry import register


@register(
    "region_revenue",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               COUNT(*) AS n_lineitems,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY region, nation
        ORDER BY region, nation
    """,
    tags=("join", "aggregate"),
    doc="J1 dimension-enrichment joins (broadcast the small dims) — dbt "
    "fact_polls.sql:50-54 polls LEFT JOIN institutes/parties.",
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .orderBy("region", "nation")
    )


@register(
    "lateral_top1",
    oracle="""
        WITH counts AS (
            SELECT l_suppkey, l_quantity, COUNT(*) AS n
            FROM lineitem
            WHERE l_quantity BETWEEN 5 AND 45
            GROUP BY l_suppkey, l_quantity
        ), best AS (
            SELECT l_suppkey, l_quantity AS modal_quantity, n AS modal_n,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                      ORDER BY n DESC, l_quantity DESC) AS rn
            FROM counts
        )
        SELECT s.s_suppkey, s.s_name, b.modal_quantity, b.modal_n
        FROM supplier s
        LEFT JOIN best b ON s.s_suppkey = b.l_suppkey AND b.rn = 1
        ORDER BY s.s_suppkey
    """,
    tags=("join", "window"),
    doc="J4 LEFT JOIN LATERAL top-1 (modal plausible value per entity) — "
    "storage/postgres.py:858-867: per-study modal sample size with "
    "count DESC, value DESC tie-break and a plausibility range. Rewritten "
    "as pre-aggregate + window rank + left join (no correlated subquery).",
)
def lateral_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    counts = (
        li.filter(F.col("l_quantity").between(5, 45))
        .groupBy("l_suppkey", "l_quantity")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("n"), F.desc("l_quantity"))
    best = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_suppkey",
            F.col("l_quantity").alias("modal_quantity"),
            F.col("n").alias("modal_n"),
        )
    )
    return (
        s.join(best, s.s_suppkey == best.l_suppkey, "left")
        .select("s_suppkey", "s_name", "modal_quantity", "modal_n")
        .orderBy("s_suppkey")
    )


@register(
    "customers_no_orders",
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_mktsegment
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_custkey IS NULL
        ORDER BY c.c_custkey
    """,
    tags=("join",),
    doc="J5 coverage anti-join (datasets with no topic label) — streamlit "
    "3_Topic_Browser.py:470-474. Spark left_anti join.",
)
def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "exists_semi_anti",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice > 400000)
        ORDER BY c.c_custkey
    """,
    tags=("join",),
    doc="J9 EXISTS / NOT EXISTS queue semantics — "
    "migrations/0011_attribution_attempts.sql:21-31 (has claims AND no "
    "attributions AND no zero-yield attempt) → left_semi + left_anti.",
)
def exists_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    open_orders = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    big_finished = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000)
    ).select("o_custkey")
    return (
        c.join(open_orders, c.c_custkey == open_orders.o_custkey, "left_semi")
        .join(big_finished, c.c_custkey == big_finished.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "unified_union",
    oracle="""
        WITH unified AS (
            SELECT 'orders' AS source, CAST(o_orderkey AS BIGINT) AS id,
                   o_orderpriority AS label, o_totalprice AS val
            FROM orders
            UNION ALL
            SELECT 'events' AS source, CAST(event_id AS BIGINT) AS id,
                   event_type AS label, value AS val
            FROM events
        )
        SELECT source, label, COUNT(*) AS n, ROUND(SUM(val), 4) AS total_val,
               COUNT(DISTINCT id) AS n_ids
        FROM unified
        GROUP BY source, label
        ORDER BY source, label
    """,
    tags=("setop", "aggregate"),
    doc="§2.7 UNION ALL of heterogeneous sources projected to a common "
    "schema — sql/create_datasets_unified_view.sql:31-57; unionByName.",
)
def unified_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("source"),
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("o_orderpriority").alias("label"),
        F.col("o_totalprice").alias("val"),
    )
    e = table(spark, sf_dir, "events").select(
        F.lit("events").alias("source"),
        F.col("event_id").cast("long").alias("id"),
        F.col("event_type").alias("label"),
        F.col("value").alias("val"),
    )
    return (
        o.unionByName(e)
        .groupBy("source", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val"), 4).alias("total_val"),
            F.countDistinct("id").alias("n_ids"),
        )
        .orderBy("source", "label")
    )


@register(
    "latest_metadata_join",
    oracle="""
        WITH latest AS (
            SELECT o_custkey,
                   ARG_MAX(o_orderstatus, o_orderkey) AS last_status,
                   ARG_MAX(o_orderpriority, o_orderkey) AS last_priority,
                   MAX(o_orderdate) AS last_orderdate
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               l.last_status, l.last_priority, l.last_orderdate
        FROM customer c
        LEFT JOIN latest l ON c.c_custkey = l.o_custkey
        ORDER BY c.c_custkey
    """,
    tags=("join", "aggregate"),
    doc="J2 latest-metadata enrichment: LEFT JOIN + argMax group — "
    "sql/select_topic_dataset_catalog.sql:19-26.",
)
def latest_metadata_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    latest = o.groupBy("o_custkey").agg(
        F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
        F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
        F.max("o_orderdate").alias("last_orderdate"),
    )
    return (
        c.join(latest, c.c_custkey == latest.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "last_status",
            "last_priority",
            "last_orderdate",
        )
        .orderBy("c_custkey")
    )


# --- skew-mitigated join (SCALE.md joins strategy, demonstrated) ----------

_SALTS = 8


@register(
    "skew_join_salted",
    oracle="""
        WITH fact AS (
            SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
                        ELSE CAST(l_orderkey % 100 AS BIGINT) END AS skew_key,
                   l_quantity
            FROM lineitem
        ), dim AS (
            SELECT DISTINCT CASE WHEN o_orderkey % 10 < 7 THEN 0
                        ELSE CAST(o_orderkey % 100 AS BIGINT) END AS skew_key
            FROM orders
        ), dim2 AS (
            SELECT skew_key, 'grp_' || (skew_key % 7) AS dim_group FROM dim
        )
        SELECT d.dim_group,
               COUNT(*) AS n,
               ROUND(SUM(f.l_quantity), 4) AS sum_qty
        FROM fact f JOIN dim2 d USING (skew_key)
        GROUP BY d.dim_group
        ORDER BY d.dim_group
    """,
    tags=("join", "skew"),
    doc="Salted skew join: ~70% of fact rows share one hot key (the "
    "classic power-law key distribution at 100 TB). The fact side "
    "gets salt = pmod(xxhash64(row id), 8); the dim side is exploded "
    "x8 so every (key, salt) partition exists; the join runs on "
    "(key, salt) — hot-key work spreads over 8 reducers instead of "
    "one straggler. shuffle_hash hint forces the shuffle join path "
    "(broadcast would hide the technique; at scale the dim is too "
    "big to broadcast — that's when salting applies; AQE skew-split "
    "is the automatic fallback, this is the deterministic form). "
    "Results are provably identical to the unsalted join (the "
    "oracle IS the unsalted join).",
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    skew = F.when(F.col("l_orderkey") % 10 < 7, F.lit(0)).otherwise(
        (F.col("l_orderkey") % 100).cast("long")
    )
    fact = li.select(
        skew.alias("skew_key"),
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALTS))
        .cast("int")
        .alias("salt"),
    )
    dskew = F.when(F.col("o_orderkey") % 10 < 7, F.lit(0)).otherwise(
        (F.col("o_orderkey") % 100).cast("long")
    )
    dim = (
        o.select(dskew.alias("skew_key"))
        .distinct()
        .select(
            "skew_key",
            F.concat(F.lit("grp_"), (F.col("skew_key") % 7).cast("string")).alias(
                "dim_group"
            ),
        )
    )
    dim_salted = dim.select(
        "skew_key",
        "dim_group",
        F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))).alias("salt"),
    )
    joined = fact.hint("shuffle_hash").join(
        dim_salted, ["skew_key", "salt"]
    )
    return (
        joined.groupBy("dim_group")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .orderBy("dim_group")
    )


# --- as-of (temporal) join -------------------------------------------------
# Beyond the reference's operator set (it has no temporal joins), but a
# first-class op for event pipelines: enrich each event with the rate
# in effect at event time. DuckDB's native ASOF JOIN is the oracle; the
# Spark rendition is the union + last-non-null-over-window pattern,
# which scales as ONE shuffle on (key) + an ordered window — no
# per-event probe, no range cross-join.


def _rates_sql() -> str:
    """Deterministic slowly-changing rate table: one change every 3rd
    January day per event_type."""
    return """
        SELECT et.event_type,
               CAST('2024-01-01' AS TIMESTAMP)
                   + INTERVAL (d.d) DAY AS effective_ts,
               (LENGTH(et.event_type) * 10 + d.d) / 100.0 AS rate
        FROM (SELECT DISTINCT event_type FROM events) et
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 29, 3)) AS d) d
    """


@register(
    "asof_join_rates",
    oracle=f"""
        WITH rates AS ({_rates_sql()}),
        enriched AS (
            SELECT e.event_type, CAST(e.ts AS DATE) AS day,
                   r.rate, e.value
            FROM events e
            ASOF LEFT JOIN rates r
              ON e.event_type = r.event_type AND e.ts >= r.effective_ts
        )
        SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day, rate,
               COUNT(*) AS n_events,
               ROUND(SUM(value * rate), 4) AS rated_value
        FROM enriched
        GROUP BY event_type, day, rate
        ORDER BY event_type, day
    """,
    tags=("join", "temporal"),
    doc="As-of join: each event picks the most recent rate with "
    "effective_ts <= event ts (per event_type), then a rated daily "
    "aggregate. Oracle is DuckDB's native ASOF JOIN; the Spark plan is "
    "the scalable union trick — union rate-change rows with event rows, "
    "one window per key ordered by (ts, rate-first), last(rate, "
    "ignorenulls) carries the in-effect rate forward. One shuffle on "
    "event_type total; at 100 TB this beats a range-condition join "
    "(which Spark would execute as BNLJ) by construction.",
)
def asof_join_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    etypes = e.select("event_type").distinct()
    days = spark.range(0, 30, 3).select(F.col("id").alias("d"))
    rates = etypes.crossJoin(days).select(
        "event_type",
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_dt_interval(F.col("d"))
        ).alias("effective_ts"),
        ((F.length("event_type") * 10 + F.col("d")) / 100.0).alias("rate"),
    )
    tagged_rates = rates.select(
        "event_type",
        F.col("effective_ts").alias("ts"),
        "rate",
        F.lit(1).alias("is_rate"),
        F.lit(None).cast("double").alias("value"),
    )
    tagged_events = e.select(
        "event_type",
        "ts",
        F.lit(None).cast("double").alias("rate"),
        F.lit(0).alias("is_rate"),
        "value",
    )
    combined = tagged_rates.unionByName(tagged_events)
    # rate rows sort BEFORE event rows at the same timestamp, so an
    # event exactly at an effective_ts picks the new rate (<= semantics)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts"), F.col("is_rate").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = (
        combined.withColumn(
            "eff_rate", F.last("rate", ignorenulls=True).over(w)
        )
        .filter(F.col("is_rate") == 0)
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("eff_rate").alias("rate"),
            "value",
        )
    )
    return (
        enriched.groupBy(
            "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"), "rate"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("rate")), 4).alias(
                "rated_value"
            ),
        )
        .orderBy("event_type", "day")
    )


@register(
    "revenue_rollup",
    oracle="""
        WITH base AS (
            SELECT r.r_name, n.n_name,
                   o.o_totalprice AS price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        )
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               CAST(GROUPING(r_name) AS INTEGER) * 2
                 + CAST(GROUPING(n_name) AS INTEGER) AS agg_level,
               COUNT(*) AS n_orders,
               ROUND(SUM(price), 4) AS revenue
        FROM base
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY agg_level, region, nation
    """,
    tags=("aggregate", "rollup"),
    doc="Hierarchical ROLLUP aggregate (region -> nation -> grand "
    "total) with GROUPING() level indicators — beyond the reference's "
    "operator set (it has no grouping sets), standard warehouse "
    "surface. Spark expands rollup into a single expand+hash-aggregate: "
    "one shuffle, partial aggregation applies per grouping set; the "
    "broadcast dim chain reuses the region_revenue join shape.",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("r_name", "n_name", F.col("o_totalprice").alias("price"))
    )
    agg_level = (
        F.grouping("r_name").cast("int") * 2 + F.grouping("n_name").cast("int")
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            agg_level.alias("agg_level"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 4).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "agg_level",
            "n_orders",
            "revenue",
        )
        .orderBy("agg_level", "region", "nation")
    )


# --- bucketed range join (batch interval correlation) ----------------------

_RJ_WINDOW_SEC = 7200  # (view_ts, view_ts + 2h] — matches stream_stream_join


@register(
    "range_join_events",
    oracle=f"""
        WITH matched AS (
            SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
                   p.event_id AS purchase_id,
                   CAST(DATEDIFF('second', v.ts, p.ts) AS BIGINT) AS gap_sec
            FROM events v
            JOIN events p
              ON p.user_id = v.user_id
             AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL {_RJ_WINDOW_SEC} SECOND
            WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY view_id
                       ORDER BY gap_sec, purchase_id) AS rn,
                   COUNT(*) OVER (PARTITION BY view_id) AS n_purchases_2h
            FROM matched
        )
        SELECT user_id, view_id,
               STRFTIME(view_ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
               n_purchases_2h,
               purchase_id AS first_purchase_id,
               gap_sec AS first_gap_sec
        FROM ranked WHERE rn = 1
        ORDER BY view_id
    """,
    tags=("join", "temporal"),
    doc="Bucketed range join: every 'view' event correlated with the "
    "same user's 'purchase' events in the following 2 hours — the "
    "batch twin of stream_stream_join. Spark has no native range-join "
    "operator; a raw (t > a AND t <= a+w) theta join plans as a "
    "broadcast-nested-loop over every same-user pair. Instead both "
    "sides are bucketed at the window width (epoch div 7200) and each "
    "purchase row is replicated to its own and the PRECEDING bucket, "
    "so every qualifying pair meets in an equi-join on (user_id, "
    "bucket) — 2x replication of one side buys a hash join whose "
    "candidate set is the per-(user, 4h) neighborhood, independent of "
    "corpus size; the exact interval predicate then prunes the "
    "false candidates. gap_sec is an integer, so ordering and the "
    "first-match pick are float-drift-free. At 100 TB both sides "
    "shuffle once on (user_id, bucket) — the same key the events "
    "table would be stored bucketed by.",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = _RJ_WINDOW_SEC
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        (F.unix_timestamp("ts") / w).cast("long").alias("bucket"),
    )
    p0 = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        (F.unix_timestamp("ts") / w).cast("long").alias("pb"),
    )
    # a purchase in bucket b can only match views in buckets {b-1, b}:
    # replicate each purchase to both so candidates meet in an equi-join
    purchases = p0.select(
        "p_user",
        "purchase_id",
        "purchase_ts",
        F.explode(F.array(F.col("pb"), F.col("pb") - 1)).alias("bucket"),
    )
    matched = (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (views["bucket"] == purchases["bucket"]),
        )
        .filter(
            # exact-timestamp interval check (microsecond precision):
            # comparing seconds-truncated epochs here would disagree
            # with the oracle on pairs within 1 s of the window edge
            (F.col("purchase_ts") > F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr(f"INTERVAL {w} SECONDS")
            )
        )
        .select(
            "user_id",
            "view_id",
            "view_ts",
            "purchase_id",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
            ).alias("gap_sec"),
        )
    )
    rw = Window.partitionBy("view_id").orderBy("gap_sec", "purchase_id")
    cw = Window.partitionBy("view_id")
    return (
        matched.withColumn("rn", F.row_number().over(rw))
        .withColumn("n_purchases_2h", F.count(F.lit(1)).over(cw))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "view_id",
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "view_ts"
            ),
            "n_purchases_2h",
            F.col("purchase_id").alias("first_purchase_id"),
            F.col("gap_sec").alias("first_gap_sec"),
        )
        .orderBy("view_id")
    )


@register(
    "cube_orders",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) * 2
                 + CAST(GROUPING(o_orderpriority) AS INTEGER) AS agg_level,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY agg_level, status, priority
    """,
    tags=("aggregate", "cube"),
    doc="CUBE over (status, priority) — all four grouping sets in one "
    "pass, completing the grouping-sets family next to revenue_rollup. "
    "Spark plans cube as Expand (4 replicas tagged with grouping ids) "
    "into ONE hash aggregate: a single shuffle keyed on the expanded "
    "grouping key, partial aggregation per set on the map side. The "
    "alternative — four separate groupBys unioned — would scan the "
    "fact table four times; at 100 TB the single Expand pass wins "
    "despite the 4x intermediate row fan-out because partial aggs "
    "collapse it before the exchange.",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    agg_level = (
        F.grouping("o_orderstatus").cast("int") * 2
        + F.grouping("o_orderpriority").cast("int")
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            agg_level.alias("agg_level"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "agg_level",
            "n_orders",
            "revenue",
        )
        .orderBy("agg_level", "status", "priority")
    )


@register(
    "grouping_sets_orders",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT), -1)
                   AS order_year,
               CAST(GROUPING(o_orderstatus) AS INTEGER) * 4
                 + CAST(GROUPING(o_orderpriority) AS INTEGER) * 2
                 + CAST(GROUPING(EXTRACT(YEAR FROM o_orderdate)) AS INTEGER)
                   AS agg_level,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY GROUPING SETS (
            (o_orderstatus, EXTRACT(YEAR FROM o_orderdate)),
            (o_orderpriority, EXTRACT(YEAR FROM o_orderdate)),
            ()
        )
        ORDER BY agg_level, status, priority, order_year
    """,
    tags=("aggregate", "cube"),
    doc="Arbitrary GROUPING SETS — the report shape CUBE/ROLLUP can't "
    "express: (status x year) and (priority x year) breakdowns plus "
    "the grand total in ONE pass, skipping the cross combinations a "
    "CUBE would needlessly compute. Spark SQL plans this as a single "
    "Expand (one replica per set, 3x here vs CUBE's 8x) into one hash "
    "aggregate — same single-shuffle property as cube_orders with a "
    "smaller fan-out; completes the grouping family "
    "(revenue_rollup = ROLLUP, cube_orders = CUBE). The SQL API is "
    "the idiomatic Spark surface for grouping sets; GROUPING() "
    "indicators disambiguate aggregate rows from genuine NULL keys "
    "identically on both engines.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_gsets_v"
    )
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(CAST(YEAR(o_orderdate) AS BIGINT), -1)
                   AS order_year,
               CAST(GROUPING(o_orderstatus) AS INT) * 4
                 + CAST(GROUPING(o_orderpriority) AS INT) * 2
                 + CAST(GROUPING(YEAR(o_orderdate)) AS INT) AS agg_level,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders_gsets_v
        GROUP BY GROUPING SETS (
            (o_orderstatus, YEAR(o_orderdate)),
            (o_orderpriority, YEAR(o_orderdate)),
            ()
        )
        ORDER BY agg_level, status, priority, order_year
        """
    )
