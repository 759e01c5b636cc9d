"""Testdata table access (TESTDATA.md).

Parquet scans are the canonical source: columnar, predicate-pushdown
and column-pruning friendly (reference analog: ClickHouse MergeTree
scans + pandas file loads, elt/loader_clickhouse.py:284-337).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy — Catalyst prunes columns and pushes
    predicates into the parquet reader for whatever plan is built on top.

    `events.parquet` stores TIMESTAMP(NANOS), which vanilla Spark refuses
    (PARQUET_TYPE_ILLEGAL); read it as long nanos and convert to a
    microsecond timestamp (identical to DuckDB's ns->us read)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div: double division would round the microsecond up
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition a small-file scan before CPU-heavy per-row work.

    A single-file parquet scan yields one partition, serializing any
    expensive projection (hashing, shingling, vector math) onto one
    core. The shuffle cost of a few thousand rows is trivial next to
    the win of engaging every core; on a real cluster the same helper
    spreads per-document work across executors."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
