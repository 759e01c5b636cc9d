"""File-format scan/sink demonstrations (SURVEY §2.1 S1/S2/S3/S25:
elt/loader_clickhouse.py:284-337 load_from_file csv/json/parquet,
study_scraper/export.py:45-85 csv export).

The reference's loader reads CSV/JSON/parquet files into tables via
pandas; here the same formats go through Spark's native readers with
explicit schemas (schema inference is a correctness hazard and a
second full scan at 100 TB — always pass the schema).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .registry import register

_NATION_SCHEMA = "n_nationkey long, n_name string, n_regionkey long"


@register(
    "csv_json_roundtrip",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey,
               n_name AS n_name_json
        FROM nation
        ORDER BY n_nationkey
    """,
    tags=("source", "sink", "format"),
    doc="S1/S2/S25 format roundtrip (loader_clickhouse.py:284-337, "
    "export.py:45-85): write the nation dim as headered CSV and "
    "line-delimited JSON, read both back with EXPLICIT schemas "
    "(spark.read.csv / spark.read.json — never schema inference, "
    "which costs a second scan and type drift at scale), then "
    "broadcast-join the two reads to prove value fidelity. The "
    "roundtrip itself is the assertion: any quoting/encoding/type "
    "loss breaks the oracle hash.",
)
def csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_io_{os.getpid()}"
    )
    csv_path, json_path = base + "_csv", base + "_json"
    n.coalesce(1).write.mode("overwrite").option("header", True).csv(csv_path)
    n.coalesce(1).write.mode("overwrite").json(json_path)
    c = spark.read.schema(_NATION_SCHEMA).option("header", True).csv(csv_path)
    j = spark.read.schema(_NATION_SCHEMA).json(json_path)
    return (
        c.join(
            F.broadcast(j.select("n_nationkey", F.col("n_name").alias("n_name_json"))),
            "n_nationkey",
        )
        .select("n_nationkey", "n_name", "n_regionkey", "n_name_json")
        .orderBy("n_nationkey")
    )


# --- bucketed co-located join (zero-shuffle large-large join) -------------

_N_BUCKETS = 16


@register(
    "bucketed_join",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("join", "storage"),
    doc="Bucketed co-located join: both sides written with "
    f"bucketBy({_N_BUCKETS}, custkey) + sortBy, then joined on the "
    "bucket key — the join runs as a SortMergeJoin with ZERO shuffle "
    "exchanges (asserted in tests via the executed plan), because both "
    "scans already deliver hash(custkey)-partitioned sorted buckets. "
    "THE layout tool for the repeated large-large join at 100 TB "
    "(fact-fact reconciliation, reference elt re-read patterns): the "
    "shuffle is paid once at write time and amortized over every later "
    "join. Bucket tables land in /tmp (external path) so bench reruns "
    "overwrite them; bucket count would be sized to target-partition "
    "bytes at scale.",
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = os.path.join(
        tempfile.gettempdir(), "elt4t_buckets", os.path.basename(sf_dir.rstrip("/"))
    )
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    (
        o.write.bucketBy(_N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .option("path", os.path.join(base, "orders"))
        .saveAsTable("b_orders")
    )
    (
        c.write.bucketBy(_N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .option("path", os.path.join(base, "customer"))
        .saveAsTable("b_customer")
    )
    j = bucketed_join_plan(spark)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


def bucketed_join_plan(spark: SparkSession) -> DataFrame:
    """The join stage alone (tests assert its executed plan has a
    SortMergeJoin and no Exchange). hint('merge') pins SMJ so the
    demo can't silently degrade to a broadcast join on small inputs."""
    bo = spark.table("b_orders")
    bc = spark.table("b_customer").hint("merge")
    return bo.join(bc, F.col("o_custkey") == F.col("c_custkey"))


# --- partitioned layout + partition-pruned scan ---------------------------

_PRUNE_FROM = "2024-01-20"


@register(
    "partitioned_scan_prune",
    oracle=f"""
        SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) >= DATE '{_PRUNE_FROM}'
        GROUP BY day, event_type
        ORDER BY day, event_type
    """,
    tags=("storage", "aggregate"),
    doc="Hive-partitioned layout + partition-pruned scan: events are "
    "written once partitioned by day (the write-side half of the "
    "pattern), then the date-filtered aggregate reads ONLY the "
    "matching day directories — the test asserts the scan's "
    "PartitionFilters carry the predicate, so at 100 TB a week-long "
    "query touches a week of files regardless of table size. Day "
    "arrives as the partition column (string directory value cast "
    "back to date); the oracle is the same filter over the flat table.",
)
def partitioned_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = partitioned_events_path(sf_dir)
    ev = table(spark, sf_dir, "events")
    (
        ev.withColumn("day", F.to_date(F.col("ts").cast("timestamp")))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(out)
    )
    part = pruned_events_scan(spark, sf_dir)
    return (
        part.groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("day", "event_type")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "total_value",
        )
    )


def partitioned_events_path(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        "elt4t_partitioned",
        os.path.basename(sf_dir.rstrip("/")),
        "events",
    )


def pruned_events_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtered scan alone (tests assert PartitionFilters on it)."""
    return spark.read.parquet(partitioned_events_path(sf_dir)).filter(
        F.col("day") >= F.lit(_PRUNE_FROM).cast("date")
    )
