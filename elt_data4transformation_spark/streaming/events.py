"""Structured Streaming renditions of the reference's incremental
patterns (SURVEY §2.11): tumbling-window aggregation with a watermark,
stateful new-vs-known id dedup, and session windows.

The reference has no true streaming — these are the Spark-native
upgrades of its batch-incremental idioms (high-watermark reads,
known-id diffs, run snapshots). Each runner here drives a bounded
parquet-backed stream to completion with a memory sink so results are
comparable 1:1 against the batch oracle; swap source/sink for Kafka +
foreachBatch in production and the plans are unchanged.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

_COUNTER = itertools.count()

EVENTS_RAW_SCHEMA = Ty.StructType(
    [
        Ty.StructField("event_id", Ty.LongType()),
        Ty.StructField("ts", Ty.LongType()),  # TIMESTAMP(NANOS) read as long
        Ty.StructField("user_id", Ty.LongType()),
        Ty.StructField("event_type", Ty.StringType()),
        Ty.StructField("value", Ty.DoubleType()),
        Ty.StructField("props", Ty.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table; nanosecond timestamps
    arrive as longs (see sources/tables.py) and are converted to
    microsecond timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source wants a directory; glob-filter to the events table
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    name = f"stream_out_{os.getpid()}_{next(_COUNTER)}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type — the
    streaming twin of plans/events.py events_tumbling (epoch-aligned
    windows == date_trunc buckets)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        F.round("sum_value", 4).alias("total_value"),
    )


def stateful_new_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dropDuplicates on the entity key — the streaming form of
    new-vs-known id detection (main.py:80-85: known_ids set diff). The
    emitted set of distinct keys is deterministic even though which
    physical row wins is not; only key columns are kept."""
    ev = read_events_stream(spark, sf_dir)
    distinct_keys = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_memory(distinct_keys, "append")


def session_windows(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Native session_window sessionization — the streaming twin of the
    batch lag+cumsum sessionize plan (plans/windows.py)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select("user_id", "session_start", "session_end", "n_events")
