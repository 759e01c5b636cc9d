"""Streaming queries registered against batch oracles: each runs a real
Structured Streaming job (file source → watermark/window/state → memory
sink) to completion and returns the result, which must hash-match the
equivalent batch SQL in DuckDB. This is the strongest check available
for streaming semantics on a bounded input (SURVEY §2.11 / Phase 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import events as streaming_events
from .registry import register


@register(
    "stream_tumbling",
    oracle="""
        SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    tags=("streaming",),
    doc="Structured Streaming tumbling-window aggregation with watermark "
    "(readStream -> window('1 hour') -> memory sink); epoch-aligned "
    "windows equal date_trunc buckets, so the batch oracle is exact — "
    "§2.11 Spark mapping of the reference's incremental aggregates.",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.tumbling_counts(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )


@register(
    "stream_new_ids",
    oracle="""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
    """,
    tags=("streaming",),
    doc="Stateful streaming dropDuplicates on the entity key — "
    "new-vs-known id detection (reference main.py:80-85 known_ids set "
    "diff) as a streaming operator; emitted key set equals batch "
    "DISTINCT.",
)
def stream_new_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.stateful_new_ids(spark, sf_dir).orderBy(
        "user_id", "event_type"
    )


@register(
    "stream_dedup_watermark",
    oracle="""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
    """,
    tags=("streaming",),
    doc="dropDuplicatesWithinWatermark on the entity key — the dedup "
    "variant whose state is EVICTED when the watermark passes, i.e. the "
    "only one that survives an unbounded stream (plain dropDuplicates "
    "state grows forever). Bounded fixture fits one watermark horizon, "
    "so the emitted key set equals batch DISTINCT.",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.watermarked_dedup(spark, sf_dir).orderBy(
        "user_id", "event_type"
    )


@register(
    "stream_sessions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR DATE_DIFF('microsecond', prev_ts, ts) >= 1800000000
                           THEN 1 ELSE 0 END AS is_new
            FROM seq
        ), sess AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_start
    """,
    tags=("streaming", "sessionize"),
    doc="Native session_window sessionization (30 min gap) driven as a "
    "real streaming job; oracle is the batch lag+cumsum rendition with "
    "the gap compared in microseconds (session_window starts a new "
    "session when the gap >= the timeout).",
)
def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.session_windows(spark, sf_dir).orderBy(
        "user_id", "session_start"
    )


@register(
    "stream_snapshot_diff",
    oracle="""
        WITH prev AS (
            SELECT event_type, ROUND(AVG(value), 4) AS avg_value
            FROM events WHERE ts < TIMESTAMP '2024-01-16'
            GROUP BY event_type
        ), cur AS (
            SELECT event_type, ROUND(AVG(value), 4) AS avg_value
            FROM events GROUP BY event_type
        )
        SELECT c.event_type, p.avg_value AS prev_avg, c.avg_value AS cur_avg,
               CASE WHEN p.event_type IS NULL THEN 'new'
                    WHEN ABS(c.avg_value - p.avg_value) >= 0.5 THEN 'shift'
                    ELSE 'steady' END AS status
        FROM cur c LEFT JOIN prev p ON c.event_type = p.event_type
        ORDER BY c.event_type
    """,
    tags=("streaming",),
    doc="foreachBatch run-over-run snapshot diff: run 1 streams the "
    "pre-split events into a snapshot, run 2 streams everything and "
    "diffs per-batch aggregates against it inside foreachBatch — the "
    "Structured-Streaming form of the reference's digest cycle "
    "(study_scraper/digest.py:97-139; §2.11 'foreachBatch comparing "
    "against snapshot table').",
)
def stream_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.foreach_batch_snapshot_diff(spark, sf_dir).orderBy(
        "event_type"
    )


@register(
    "stream_stateful_stats",
    oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("streaming",),
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running (count, sum) held in GroupState across "
    "micro-batches; final state equals the batch group-by on the "
    "bounded fixture — the reference's partial-run progress counters "
    "(ingest.py:30-36) as a first-class Arrow-batched stateful op.",
)
def stream_stateful_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = streaming_events.stateful_running_stats(spark, sf_dir)
    from pyspark.sql import functions as F

    return out.select(
        "user_id", "n_events", F.round("sum_value", 4).alias("sum_value")
    ).orderBy("user_id")


@register(
    "stream_sliding",
    oracle="""
        WITH contrib AS (
            SELECT DATE_TRUNC('day', ts) AS window_start, event_type, value
            FROM events
            UNION ALL
            SELECT DATE_TRUNC('day', ts) - INTERVAL 1 DAY, event_type, value
            FROM events
        )
        SELECT window_start,
               window_start + INTERVAL 2 DAY AS window_end,
               event_type, COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM contrib
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    tags=("streaming",),
    doc="Sliding-window streaming aggregation (window('2 days' slide "
    "'1 day')): each event contributes to width/slide overlapping "
    "windows — the streaming form of the dbt rolling 7/30-day frames "
    "(W2/W3). Day-aligned epoch makes the slide-shifted date_trunc "
    "union an exact batch oracle.",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    out = streaming_events.sliding_counts(spark, sf_dir)
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("window_start", "event_type")


@register(
    "stream_static_join",
    oracle="""
        WITH rates AS (
            SELECT t AS event_type, (LENGTH(t) * 10 + 7) / 100.0 AS rate
            FROM UNNEST(['click','view','purchase','login','error']) AS u(t)
        )
        SELECT DATE_TRUNC('day', e.ts) AS window_start, e.event_type,
               COUNT(*) AS n,
               ROUND(SUM(e.value * COALESCE(r.rate, 1.0)), 4) AS rated_value
        FROM events e LEFT JOIN rates r ON e.event_type = r.event_type
        GROUP BY window_start, e.event_type
        ORDER BY window_start, e.event_type
    """,
    tags=("streaming", "join"),
    doc="Stream-static join: readStream events enriched against a "
    "static rate dimension (broadcast per micro-batch — no state "
    "store), then a watermarked daily tumbling aggregate of rated "
    "values; epoch-aligned windows equal date_trunc buckets so the "
    "batch oracle is exact. The Spark-native form of the reference's "
    "enrich-on-ingest joins (elt loader dimension lookups) for "
    "unbounded inputs.",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.stream_static_enriched(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )


@register(
    "stream_upsert_materialize",
    oracle="""
        SELECT event_type,
               ROUND(SUM(value), 4) AS sum_value,
               COUNT(*) AS n_events,
               MAX(ts) AS last_ts
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("streaming", "incremental", "upsert"),
    doc="Streaming incremental materialization (the dbt-incremental / "
    "reference high-watermark refresh as a streaming job): per-batch "
    "partial aggregates MERGE into a versioned parquet state table via "
    "foreachBatch copy-on-write; the final version equals the batch "
    "group-by. Multi-micro-batch merge correctness is proven in tests "
    "with a 4-file split at maxFilesPerTrigger=1.",
)
def stream_upsert_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    out = streaming_events.stream_upsert_materialized(spark, sf_dir)
    return out.select(
        "event_type",
        F.round("sum_value", 4).alias("sum_value"),
        "n_events",
        "last_ts",
    ).orderBy("event_type")


@register(
    "stream_stream_join",
    oracle="""
        SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
               STRFTIME(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
               STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        FROM events v
        JOIN events p
          ON p.user_id = v.user_id
         AND p.ts > v.ts
         AND p.ts <= v.ts + INTERVAL 2 HOUR
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        ORDER BY v.user_id, view_id, purchase_id
    """,
    tags=("streaming", "join"),
    doc="Watermarked stream-stream inner join (view -> purchase within "
    "2 h per user): the §2.11 pattern Spark adds beyond the reference's "
    "batch reconciliations — correlating two live streams with bounded "
    "state. Both sides watermark at 1 h, so view-side join state is "
    "evicted once the purchase watermark passes view_ts + 2 h; on an "
    "unbounded 100 TB/day stream the state size is the 3-hour event "
    "volume per side, independent of stream age. Emitted matches on "
    "the bounded fixture equal the batch time-range self-join, which "
    "is the oracle.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.stream_stream_view_purchase(spark, sf_dir).orderBy(
        "user_id", "view_id", "purchase_id"
    )


@register(
    "stream_stream_left_outer",
    oracle="""
        WITH v AS (
            SELECT user_id, event_id, ts FROM events
            WHERE event_type = 'view'
        ), p AS (
            SELECT user_id, event_id, ts FROM events
            WHERE event_type = 'purchase'
        ), wm AS (
            -- NULL (never advances) when either side is empty: DuckDB's
            -- LEAST would ignore the NULL max and release nulls, but
            -- Spark's global watermark is the MIN of both sides and
            -- stays at epoch if one stream has no rows
            SELECT CASE WHEN (SELECT COUNT(*) FROM v) = 0
                          OR (SELECT COUNT(*) FROM p) = 0 THEN NULL
                        ELSE LEAST((SELECT MAX(ts) FROM v),
                                   (SELECT MAX(ts) FROM p))
                             - INTERVAL 1 HOUR END AS w
        ), m AS (
            SELECT v.user_id, v.event_id AS view_id, v.ts AS vts,
                   p.event_id AS purchase_id, p.ts AS pts
            FROM v LEFT JOIN p
              ON p.user_id = v.user_id
             AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
        )
        SELECT user_id, view_id, purchase_id,
               STRFTIME(vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
               STRFTIME(pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        FROM m
        WHERE purchase_id IS NOT NULL
           OR vts + INTERVAL 2 HOUR < (SELECT w FROM wm)
        ORDER BY user_id, view_id, purchase_id
    """,
    tags=("streaming", "join"),
    doc="Watermarked stream-stream LEFT OUTER join — the semantics "
    "batch left-joins get for free and streams must buy with the "
    "watermark: a view with no purchase in its 2-hour window emits a "
    "NULL-purchase row only once the global watermark (min of both "
    "sides' max event time, minus the 1 h delay) proves no match can "
    "still arrive and the view's join state is evicted. The oracle "
    "reproduces exactly that gate: unmatched views filtered to "
    "view_ts + 2 h < final watermark (matched rows emit regardless — "
    "verified cell-exact on the fixture: 65 matched + 1910 "
    "watermark-released nulls, late stragglers held back on both "
    "sides). State stays bounded to ~3 h of events per side on an "
    "unbounded stream, as in stream_stream_join.",
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_events.stream_stream_view_purchase_outer(
        spark, sf_dir
    ).orderBy("user_id", "view_id", "purchase_id")
