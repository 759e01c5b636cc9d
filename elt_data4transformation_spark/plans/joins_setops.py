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
