"""Event-table queries: JSON payload access, latest-wins dedup,
tumbling-window aggregation, content-hash change detection and
high-watermark incremental reads (SURVEY.md §2.8 JSON family, §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import latest_wins
from ..sources import table
from .registry import register


@register(
    "json_extract_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(AVG(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)), 6)
                   AS avg_k,
               MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("json", "aggregate"),
    doc="§2.8 JSON-path access on a schema-on-read payload column — "
    "PG payload->>'survey_id' (migrations/0005_source_records.sql:164-175), "
    "ClickHouse JSONExtract (stg_dawum_polls.sql:29).",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "latest_event_per_user",
    oracle="""
        SELECT user_id, event_type, event_id, ts, ROUND(value, 4) AS value
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    tags=("dedup", "window"),
    doc="S6 ReplacingMergeTree latest-wins emulation: append-only table + "
    "canonical rn=1 view — elt/loader_clickhouse.py:253-282, SURVEY §1.3. "
    "The single most important read-path convention in the reference.",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        latest_wins(e, ["user_id", "event_type"], ["ts", "event_id"])
        .select(
            "user_id", "event_type", "event_id", "ts", F.round("value", 4).alias("value")
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "events_tumbling",
    oracle="""
        SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "aggregate"),
    doc="§2.11 tumbling-window aggregation — batch rendition; the streaming "
    "twin (readStream + watermark + window) is streaming/events.py and is "
    "equivalent on a closed input.",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "content_hash",
    oracle="""
        SELECT event_id,
               MD5(CONCAT_WS('|', CAST(event_id AS VARCHAR), event_type,
                             CAST(user_id AS VARCHAR), props)) AS content_hash
        FROM events
        ORDER BY event_id
        LIMIT 1000
    """,
    tags=("hash", "incremental"),
    doc="§2.11 content-hash change detection: sha/md5 of canonical payload "
    "— study_scraper/sources/dawum.py:130-133, ingest.py:12-14. Hash over "
    "string/int fields only (float formatting differs across engines).",
)
def content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.col("event_type"),
                    F.col("user_id").cast("string"),
                    F.col("props"),
                )
            ).alias("content_hash"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "watermark_incremental",
    oracle="""
        WITH wm AS (
            SELECT event_type, MAX(ts) AS high_watermark
            FROM events WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
            GROUP BY event_type
        )
        SELECT e.event_type, wm.high_watermark,
               COUNT(*) AS n_new,
               MIN(e.ts) AS first_new_ts
        FROM events e
        JOIN wm ON e.event_type = wm.event_type
        WHERE e.ts > wm.high_watermark
        GROUP BY e.event_type, wm.high_watermark
        ORDER BY e.event_type
    """,
    tags=("incremental",),
    doc="§2.11 high-watermark incremental harvest: MAX(finished_at) per "
    "(source, topic) feeds the next fetch — storage/postgres.py:1575-1594.",
)
def watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wm = (
        e.filter(F.col("ts") < F.lit("2024-01-10 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("high_watermark"))
    )
    return (
        e.join(F.broadcast(wm), "event_type")
        .filter(F.col("ts") > F.col("high_watermark"))
        .groupBy("event_type", "high_watermark")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.min("ts").alias("first_new_ts"),
        )
        .orderBy("event_type")
    )
