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


# --- ordered funnel + retention cohorts (event analytics) ------------------


@register(
    "funnel_stages",
    oracle="""
        WITH s AS (
            SELECT user_id, MIN(ts) AS s_ts FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        v AS (
            SELECT e.user_id, MIN(e.ts) AS v_ts
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'view' AND e.ts > s.s_ts
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
            GROUP BY e.user_id
        )
        SELECT stage, n_users, avg_hours_from_prev FROM (
            SELECT 1 AS ord, 'signup' AS stage, COUNT(*) AS n_users,
                   CAST(NULL AS DOUBLE) AS avg_hours_from_prev
            FROM s
            UNION ALL
            SELECT 2, 'view_after_signup', COUNT(*),
                   ROUND(AVG(DATEDIFF('second', s.s_ts, v.v_ts)) / 3600.0, 4)
            FROM v JOIN s ON v.user_id = s.user_id
            UNION ALL
            SELECT 3, 'purchase_after_view', COUNT(*),
                   ROUND(AVG(DATEDIFF('second', v.v_ts, p.p_ts)) / 3600.0, 4)
            FROM p JOIN v ON p.user_id = v.user_id
        ) ORDER BY ord
    """,
    tags=("events", "analytics"),
    doc="Ordered conversion funnel signup -> first view after signup "
    "-> first purchase after that view, with per-stage user counts and "
    "mean stage-to-stage latency. Each stage is a per-user MIN "
    "aggregate gated on the previous stage's timestamp — three "
    "aggregates all keyed on user_id, so one shuffle partitioning is "
    "planned once and reused (AQE); no window over the full event "
    "stream, no per-user collect. The product-analytics staple the "
    "reference's status/report layer approximates with per-status "
    "counts (study_scraper/status.py:90-123).",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def lag_hours(a: str, b: str) -> F.Column:
        return F.round(
            F.avg(
                (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(3600.0)
            ),
            4,
        )

    row1 = s.agg(
        F.lit(1).alias("ord"),
        F.lit("signup").alias("stage"),
        F.count(F.lit(1)).alias("n_users"),
        F.lit(None).cast("double").alias("avg_hours_from_prev"),
    )
    row2 = (
        v.join(s, "user_id")
        .agg(
            F.lit(2).alias("ord"),
            F.lit("view_after_signup").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            lag_hours("s_ts", "v_ts").alias("avg_hours_from_prev"),
        )
    )
    row3 = (
        p.join(v, "user_id")
        .agg(
            F.lit(3).alias("ord"),
            F.lit("purchase_after_view").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            lag_hours("v_ts", "p_ts").alias("avg_hours_from_prev"),
        )
    )
    return (
        row1.unionByName(row2)
        .unionByName(row3)
        .orderBy("ord")
        .drop("ord")
    )


_COHORT_EPOCH = "2024-01-01"  # week-index origin: engine-neutral integer
# arithmetic instead of date_trunc('week') so neither engine's
# week-start convention can shift a cohort


@register(
    "retention_cohorts",
    oracle=f"""
        WITH firsts AS (
            SELECT user_id,
                   CAST(FLOOR(DATEDIFF('day', DATE '{_COHORT_EPOCH}',
                        CAST(MIN(ts) AS DATE)) / 7.0) AS BIGINT) AS cohort_week
            FROM events GROUP BY user_id
        ),
        sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_size
            FROM firsts GROUP BY cohort_week
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(FLOOR(DATEDIFF('day', DATE '{_COHORT_EPOCH}',
                        CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
                   - f.cohort_week AS week_offset
            FROM events e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT a.cohort_week AS cohort_week, a.week_offset,
               COUNT(*) AS n_active,
               s.cohort_size,
               ROUND(COUNT(*) * 100.0 / s.cohort_size, 4) AS retention_pct
        FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
        GROUP BY a.cohort_week, a.week_offset, s.cohort_size
        ORDER BY a.cohort_week, a.week_offset
    """,
    tags=("events", "analytics"),
    doc="Weekly retention cohorts: users bucketed by first-seen week, "
    "activity counted per (cohort, week-offset) as distinct active "
    "users, retention as a share of cohort size. Week indexes are "
    "day-diff integer arithmetic from a fixed origin (not "
    "date_trunc('week')) so both engines bucket identically regardless "
    "of week-start convention. Two aggregates and one join, all keyed "
    "on user_id then (cohort, offset) — at 100 TB the events scan "
    "aggregates map-side per user before the cohort shuffle.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    week = lambda c: F.floor(  # noqa: E731
        F.datediff(F.to_date(c), F.lit(_COHORT_EPOCH).cast("date")) / 7.0
    ).cast("long")
    firsts = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", week("first_ts").alias("cohort_week"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        e.select("user_id", week("ts").alias("event_week"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("event_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") * 100.0 / F.col("cohort_size"), 4
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- z-score anomaly gate --------------------------------------------------

_Z_THRESHOLD = 3.0


@register(
    "anomaly_zscore",
    oracle=f"""
        WITH stats AS (
            SELECT event_type,
                   AVG(value) AS mu,
                   STDDEV_POP(value) AS sigma
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        ), scored AS (
            SELECT e.event_type,
                   ROUND(ABS((e.value - s.mu) / NULLIF(s.sigma, 0)),
                         6) AS az
            FROM events e JOIN stats s USING (event_type)
            WHERE e.value IS NOT NULL
        )
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(*) FILTER (WHERE az >= {_Z_THRESHOLD}) AS n_anomalies,
               ROUND(MAX(az), 4) AS max_z
        FROM scored
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("events", "aggregate", "quality"),
    doc="Per-type z-score outlier gate — the numeric analogue of the "
    "corpus quality filters: value distributions are profiled per "
    "event_type and |z| >= 3 rows flagged. Two passes, zero windows: "
    "the per-type (mu, sigma) aggregate is tiny (one row per type) and "
    "joins back by broadcast, so the scoring pass is a map-only "
    "projection — at 100 TB this is two linear scans with map-side "
    "partial aggregation, never a per-type sort. Zero-variance types "
    "are NULL-guarded (nullif) identically on both engines.",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    az = F.round(
        F.abs(
            (F.col("value") - F.col("mu"))
            / F.nullif(F.col("sigma"), F.lit(0.0))
        ),
        6,
    )
    scored = e.join(F.broadcast(stats), "event_type").select(
        "event_type", az.alias("az")
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("az") >= _Z_THRESHOLD, 1)).alias(
                "n_anomalies"
            ),
            F.round(F.max("az"), 4).alias("max_z"),
        )
        .orderBy("event_type")
    )


# --- Event-type transition matrix ------------------------------------------


@register(
    "event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n,
               ROUND(COUNT(*) * 1.0
                     / SUM(COUNT(*)) OVER (PARTITION BY event_type),
                     6) AS frac
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
        ORDER BY from_type, to_type
    """,
    tags=("events", "window", "aggregate"),
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the sequence-mining counterpart of funnel_stages): "
    "lead() within (user_id | ts, event_id) pairs each event with its "
    "successor, then one hash aggregate on the (from, to) pair and a "
    "row-frequency normalization. The sequence window partitions on "
    "user_id — high cardinality, parallel at any scale; the "
    "normalizing share window runs on the n_types^2-row aggregate, "
    "which is O(1)-sized regardless of input volume.",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w_seq).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_tot = Window.partitionBy("from_type")
    return (
        counts.select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") * 1.0 / F.sum("n").over(w_tot), 6).alias(
                "frac"
            ),
        )
        .orderBy("from_type", "to_type")
    )


# --- Trailing-window distinct users ----------------------------------------

_ROLLING_DAYS = 7


@register(
    "rolling_active_users",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ), days AS (
            SELECT DISTINCT day FROM du
        ), expanded AS (
            SELECT du.user_id, du.day + CAST(o.o AS INTEGER) AS tday
            FROM du CROSS JOIN (
                SELECT UNNEST(RANGE(0, {_ROLLING_DAYS})) AS o) o
        )
        SELECT STRFTIME(days.day, '%Y-%m-%d') AS day,
               COUNT(DISTINCT e.user_id) AS wau
        FROM days JOIN expanded e ON e.tday = days.day
        GROUP BY days.day
        ORDER BY day
    """,
    tags=("events", "aggregate", "window"),
    doc=f"Trailing-{_ROLLING_DAYS}-day distinct active users per day "
    "(the WAU metric). Sliding COUNT(DISTINCT) has no per-row window "
    "form that scales — a range-frame window would re-scan the trailing "
    "week per row. Instead: dedup to (day, user) once, replicate each "
    f"row to the {_ROLLING_DAYS} target days it contributes to "
    "(explode of a constant sequence — bounded fan-out), then ONE "
    "distinct-count aggregate keyed by target day. Cost is "
    f"{_ROLLING_DAYS}x the daily-distinct table, independent of raw "
    "event volume — the same replicate-to-bucket trick as "
    "range_join_events.",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    du = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).dropDuplicates(["day", "user_id"])
    days = du.select("day").distinct()
    expanded = du.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(_ROLLING_DAYS - 1))
        ).alias("o"),
        "day",
    ).select(F.date_add("day", F.col("o")).alias("tday"), "user_id")
    return (
        days.join(expanded, days["day"] == expanded["tday"])
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


# --- Corrupt-record quarantine ---------------------------------------------


@register(
    "corrupt_quarantine",
    oracle="""
        WITH fed AS (
            SELECT event_type,
                   CASE WHEN event_id % 7 = 3
                        THEN 'corrupt<' || event_id || '>'
                        ELSE props END AS payload
            FROM events
        ), parsed AS (
            SELECT event_type,
                   CASE WHEN JSON_VALID(payload)
                        THEN CAST(JSON_EXTRACT_STRING(payload, '$.k')
                                  AS INTEGER)
                        END AS k,
                   NOT JSON_VALID(payload) AS bad
            FROM fed
        )
        SELECT event_type,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE bad) AS n_quarantined,
               ROUND(AVG(k), 6) AS avg_k_clean
        FROM parsed
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("events", "json", "quality"),
    doc="Bad-record quarantine on a schema-on-read payload: a "
    "deterministic 1-in-7 slice of the JSON payload column is replaced "
    "with garbage (the same id-arithmetic fixture construction as "
    "pii_redact), then the read path routes unparseable rows to a "
    "quarantine count instead of failing the job — the PERMISSIVE-"
    "with-audit pattern every production ingest needs, since one "
    "malformed record must never kill a 100 TB load. Validity is "
    "get_json_object returning NULL on Spark / JSON_VALID on DuckDB "
    "(agreeing on the controlled garbage); clean-row metrics aggregate "
    "only parsed payloads. Map-only projection + one hash aggregate.",
)
def corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 7 == 3,
        F.concat(F.lit("corrupt<"), F.col("event_id"), F.lit(">")),
    ).otherwise(F.col("props"))
    fed = e.select("event_type", payload.alias("payload"))
    valid = F.get_json_object("payload", "$").isNotNull()
    parsed = fed.select(
        "event_type",
        F.when(
            valid, F.get_json_object("payload", "$.k").cast("int")
        ).alias("k"),
        (~valid).alias("bad"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("bad"), 1)).alias("n_quarantined"),
            F.round(F.avg("k"), 6).alias("avg_k_clean"),
        )
        .orderBy("event_type")
    )
