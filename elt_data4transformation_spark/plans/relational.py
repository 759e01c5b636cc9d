"""Relational core: projections, filters, aggregates, scalar functions.

Covers SURVEY.md §2.2 (P1-P8), §2.4 (A1-A14), §2.6 sorts/top-k and the
§2.8 scalar-function families, mapped onto the driver testdata tables.
Reference citations are on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import spread, table
from .registry import register


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4)                              AS sum_qty,
               ROUND(SUM(l_extendedprice), 4)                        AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)     AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               ROUND(AVG(l_quantity), 6)                             AS avg_qty,
               ROUND(AVG(l_extendedprice), 6)                        AS avg_price,
               ROUND(AVG(l_discount), 6)                             AS avg_disc,
               COUNT(*)                                              AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2025-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "flagship"),
    doc="A1/A3 basic stats per group — dbt daily_poll_averages.sql:18-23 "
    "(reference: elt_data4transformation dbt_project); TPC-H Q1 shape.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2025-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "weighted_avg",
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
                   AS weighted_avg_price,
               ROUND(SUM(l_quantity), 4) AS total_weight
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregate",),
    doc="A2 weighted average sum(v*w)/sum(w) — dbt daily_poll_averages.sql:26.",
)
def weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                6,
            ).alias("weighted_avg_price"),
            F.round(F.sum("l_quantity"), 4).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "conditional_agg",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2025-01-01') AS n_recent,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               ROUND(AVG(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6) AS avg_open_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("aggregate",),
    doc="A3 conditional aggregates (CASE / FILTER) — dbt "
    "daily_poll_averages.sql:41-42, latest_poll_standings.sql:36-69.",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    recent = F.col("o_orderdate") >= F.lit("2025-01-01").cast("timestamp")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(recent, 1)).alias("n_recent"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "n_finished"
            ),
            F.round(
                F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 6
            ).alias("avg_open_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "argmax_latest",
    oracle="""
        SELECT o_custkey,
               ARG_MAX(o_orderstatus, o_orderkey) AS latest_status,
               ARG_MAX(o_totalprice, o_orderkey)  AS latest_price,
               MAX(o_orderkey)                    AS latest_orderkey
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    tags=("aggregate",),
    doc="A4 argMax latest-wins — ClickHouse argMax(val, ts), "
    "sql/select_topic_dataset_catalog.sql:9-18; Spark max_by. Keyed on the "
    "unique o_orderkey so ties cannot make the result nondeterministic.",
)
def argmax_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderstatus", "o_orderkey").alias("latest_status"),
            F.max_by("o_totalprice", "o_orderkey").alias("latest_price"),
            F.max("o_orderkey").alias("latest_orderkey"),
        )
        .orderBy("o_custkey")
    )


@register(
    "distinct_counts",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*)                    AS n_customers,
               COUNT(DISTINCT c_nationkey) AS n_nations,
               ROUND(SUM(c_acctbal), 4)    AS total_balance
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("aggregate",),
    doc="A5 distinct counts — uniqExact/countDistinct, "
    "streamlit 3_Topic_Browser.py:102-105.",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.round(F.sum("c_acctbal"), 4).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "quantiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.1), 6) AS p10,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS p50,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6) AS p90
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregate",),
    doc="A6 exact quantiles — quantileExact(0.1/0.5/0.9), "
    "streamlit 3_Topic_Browser.py:142-144.",
)
def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # single percentile aggregate over an array of fractions: one pass,
    # one sort-based agg state instead of three
    pct = F.percentile(
        "l_extendedprice", F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("_p"))
        .select(
            "l_returnflag",
            F.round(F.col("_p")[0], 6).alias("p10"),
            F.round(F.col("_p")[1], 6).alias("p50"),
            F.round(F.col("_p")[2], 6).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "mode_group",
    oracle="""
        WITH counts AS (
            SELECT l_returnflag, l_quantity, COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ), ranked AS (
            SELECT l_returnflag, l_quantity, n,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY n DESC, l_quantity DESC) AS rn
            FROM counts
        )
        SELECT l_returnflag, l_quantity AS modal_quantity, n AS modal_count
        FROM ranked WHERE rn = 1
        ORDER BY l_returnflag
    """,
    tags=("aggregate", "window"),
    doc="A7 heavy-hitter / mode — anyHeavy(score), 3_Topic_Browser.py:132. "
    "Implemented as count-rank with a deterministic tie-break (count DESC, "
    "value DESC) instead of Spark's mode() whose tie choice is undefined.",
)
def mode_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.desc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_quantity"),
            F.col("n").alias("modal_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "explode_counts",
    oracle="""
        SELECT word, COUNT(*) AS n
        FROM (SELECT UNNEST(STRING_SPLIT(p_type, ' ')) AS word FROM part)
        GROUP BY word
        ORDER BY n DESC, word
    """,
    tags=("aggregate", "array"),
    doc="A8 explode-then-count histogram — unnest(topic_ids) counts, "
    "study_scraper/status.py:90-123.",
)
def explode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
    )


@register(
    "case_normalize",
    oracle="""
        SELECT CASE
                 WHEN p_type ILIKE '%brass%'  THEN 'brass'
                 WHEN p_type ILIKE '%copper%' THEN 'copper'
                 WHEN p_type ILIKE '%steel%'  THEN 'steel'
                 WHEN p_type ILIKE '%nickel%' THEN 'nickel'
                 WHEN p_type ILIKE '%tin%'    THEN 'tin'
                 ELSE 'other'
               END AS material,
               COUNT(*) AS n_parts,
               ROUND(AVG(p_retailprice), 6) AS avg_price
        FROM part
        GROUP BY material
        ORDER BY material
    """,
    tags=("scalar", "aggregate"),
    doc="§2.8 ILIKE CASE-ladder entity normalization — "
    "dbt stg_dawum_institutes.sql:18-45, macros multiIf :99-113.",
)
def case_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    material = (
        F.when(F.col("p_type").ilike("%brass%"), "brass")
        .when(F.col("p_type").ilike("%copper%"), "copper")
        .when(F.col("p_type").ilike("%steel%"), "steel")
        .when(F.col("p_type").ilike("%nickel%"), "nickel")
        .when(F.col("p_type").ilike("%tin%"), "tin")
        .otherwise("other")
    )
    return (
        p.groupBy(material.alias("material"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
        .orderBy("material")
    )


@register(
    "date_parts",
    oracle="""
        SELECT EXTRACT(YEAR FROM o_orderdate)    AS order_year,
               EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
               EXTRACT(MONTH FROM o_orderdate)   AS order_month,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY order_year, order_quarter, order_month
        ORDER BY order_year, order_quarter, order_month
    """,
    tags=("scalar", "date"),
    doc="§2.8 date-part extraction — toYear/toQuarter/toMonth, "
    "dbt fact_polls.sql:193-197.",
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("order_year", "order_quarter", "order_month")
    )


@register(
    "date_spine",
    oracle="""
        WITH b AS (
            SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
                   MAX(CAST(o_orderdate AS DATE)) AS hi
            FROM orders
        ), spine AS (
            SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
            FROM b
        ), daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
            FROM orders GROUP BY day
        )
        SELECT STRFTIME(spine.day, '%Y-%m-%d') AS day, COALESCE(daily.n, 0) AS n_orders
        FROM spine LEFT JOIN daily USING (day)
        ORDER BY day
    """,
    tags=("generator", "date"),
    doc="§2.8 generator: recursive-CTE date spine → sequence()+explode — "
    "dbt macros/political_data_macros.sql:115-130 (create_date_spine).",
)
def date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
        .orderBy("day")
    )


@register(
    "decay_weighted",
    oracle="""
        SELECT event_type,
               ROUND(SUM(value * w) / SUM(w), 6) AS weighted_value,
               ROUND(MIN(value), 4) AS min_value,
               ROUND(MAX(value), 4) AS max_value,
               COUNT(*) AS n_events
        FROM (
            SELECT event_type, value,
                   POW(0.5, DATEDIFF('day', CAST(ts AS DATE), DATE '2025-06-01') / 30.0)
                     * LEAST(GREATEST(SQRT(value / 100.0), 0.3), 3.0) AS w
            FROM events
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("aggregate",),
    doc="A10 poll-of-polls decay-weighted mean: weight = 0.5^(age/half_life) "
    "* clamp(sqrt(n/1000), .3, 3) — study_scraper/aggregate.py:44-51, 94-175.",
)
def decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    age_days = F.datediff(F.lit("2025-06-01").cast("date"), F.to_date("ts"))
    w = F.pow(F.lit(0.5), age_days / F.lit(30.0)) * F.least(
        F.greatest(F.sqrt(F.col("value") / 100.0), F.lit(0.3)), F.lit(3.0)
    )
    return (
        e.withColumn("w", w)
        .groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("value") * F.col("w")) / F.sum("w"), 6).alias(
                "weighted_value"
            ),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "top_k_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice,
               o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort",),
    doc="§2.6 ORDER BY ... LIMIT top-k (TakeOrderedAndProject) — "
    "storage/postgres.py:876-878 recency-first truncation.",
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "o_orderpriority",
        )
    )


@register(
    "array_ops",
    oracle="""
        SELECT doc_id,
               LEN(STRING_SPLIT(text, ' ')) AS n_words,
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct_words,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) > 4))
                   AS n_long_words
        FROM documents
        ORDER BY doc_id
    """,
    tags=("array", "scalar"),
    doc="§2.8 array family: arrayFilter(x -> ...), size, distinct — "
    "sql/create_datasets_unified_view.sql:18-21, storage/postgres.py:1129.",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return (
        d.select(
            "doc_id",
            F.size(words).cast("long").alias("n_words"),
            F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
            F.size(F.filter(words, lambda w: F.length(w) > 4))
            .cast("long")
            .alias("n_long_words"),
        )
        .orderBy("doc_id")
    )


@register(
    "audit_sample",
    oracle="""
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key
        FROM documents
        ORDER BY sample_key, doc_id
        LIMIT 50
    """,
    tags=("sort", "sample"),
    doc="§2.6 audit sampling (`ORDER BY random() LIMIT n`, "
    "storage/postgres.py:1068-1069) made deterministic: rank by "
    "md5(id) — a reproducible uniform pseudo-random order that is "
    "identical across engines, runs, and partitionings (rand(seed) is "
    "partitioning-dependent in Spark, so it cannot be oracle-checked). "
    "TakeOrderedAndProject keeps it a top-k, not a global sort.",
)
def audit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias(
                "sample_key"
            ),
        )
        .orderBy("sample_key", "doc_id")
        .limit(50)
    )


# --- Quantile binning (broadcast-boundary bucketing) -----------------------


@register(
    "quantile_binning",
    oracle="""
        WITH bounds AS (
            SELECT lang,
                   ROUND(QUANTILE_CONT(n_chars, 0.25), 4) AS q1,
                   ROUND(QUANTILE_CONT(n_chars, 0.50), 4) AS q2,
                   ROUND(QUANTILE_CONT(n_chars, 0.75), 4) AS q3
            FROM documents GROUP BY lang
        )
        SELECT d.lang,
               1 + CAST(d.n_chars > b.q1 AS INTEGER)
                 + CAST(d.n_chars > b.q2 AS INTEGER)
                 + CAST(d.n_chars > b.q3 AS INTEGER) AS bucket,
               COUNT(*) AS n_docs,
               MIN(d.n_chars) AS lo,
               MAX(d.n_chars) AS hi
        FROM documents d JOIN bounds b USING (lang)
        GROUP BY d.lang, bucket
        ORDER BY d.lang, bucket
    """,
    tags=("aggregate", "rank"),
    doc="Quantile binning via broadcast boundaries — the SCALE path "
    "for distribution ranks that ntile_deciles' doc promises: exact "
    "per-group quartile cuts (one percentile aggregate, rows per "
    "group = 1) broadcast back, bucket assignment a map-only "
    "comparison chain. Unlike NTILE, no per-group sort of the full "
    "table ever happens, so fixed-cardinality groups (5 langs) cannot "
    "serialize onto single tasks at 100 TB; the tradeoff is boundary "
    "ties all land in the lower bucket rather than splitting evenly. "
    "Boundaries round to 4 decimals on both engines so the comparison "
    "itself is engine-exact.",
)
def quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    pct = F.percentile(
        "n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    bounds = d.groupBy("lang").agg(pct.alias("_p")).select(
        "lang",
        F.round(F.col("_p")[0], 4).alias("q1"),
        F.round(F.col("_p")[1], 4).alias("q2"),
        F.round(F.col("_p")[2], 4).alias("q3"),
    )
    bucket = (
        F.lit(1)
        + (F.col("n_chars") > F.col("q1")).cast("int")
        + (F.col("n_chars") > F.col("q2")).cast("int")
        + (F.col("n_chars") > F.col("q3")).cast("int")
    )
    return (
        d.join(F.broadcast(bounds), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .orderBy("lang", "bucket")
    )
