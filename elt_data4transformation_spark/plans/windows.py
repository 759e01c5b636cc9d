"""Window functions: lag/trend, moving frames, ranking, share-of-total,
latest-row dedup and sessionization (SURVEY.md §2.5 W1-W8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.upsert import latest_wins
from ..sources import table
from .registry import register


@register(
    "lag_trend",
    oracle="""
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice,
               ROUND(LAG(o_totalprice, 1) OVER w, 4) AS prev_price,
               CASE
                 WHEN LAG(o_totalprice, 1) OVER w IS NULL THEN 'new'
                 WHEN o_totalprice > LAG(o_totalprice, 1) OVER w THEN 'up'
                 WHEN o_totalprice < LAG(o_totalprice, 1) OVER w THEN 'down'
                 ELSE 'flat'
               END AS trend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
    doc="W1 LAG previous value + trend direction — dbt fact_polls.sql:69-77, "
    "macros/political_data_macros.sql:33-63. Order key includes the unique "
    "o_orderkey so same-date rows stay deterministic.",
)
def lag_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice", 1).over(w)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round(prev, 4).alias("prev_price"),
            F.when(prev.isNull(), "new")
            .when(F.col("o_totalprice") > prev, "up")
            .when(F.col("o_totalprice") < prev, "down")
            .otherwise("flat")
            .alias("trend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "moving_avg",
    oracle="""
        WITH daily AS (
            SELECT CAST(l_shipdate AS DATE) AS day,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
                        AS DECIMAL(18,4)) AS rev
            FROM lineitem GROUP BY day
        ), framed AS (
            SELECT day, rev,
                   SUM(rev) OVER w7 AS s7, COUNT(*) OVER w7 AS c7,
                   SUM(rev) OVER w30 AS s30, COUNT(*) OVER w30 AS c30,
                   SUM(CAST(rev AS DECIMAL(19,4)) * rev) OVER w30 AS ss30
            FROM daily
            WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                   w30 AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
        )
        SELECT STRFTIME(day, '%Y-%m-%d') AS day,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(s7 AS DOUBLE) / c7 AS ma7,
               CAST(s30 AS DOUBLE) / c30 AS ma30,
               SQRT(GREATEST(
                   CAST(CAST(ss30 AS VARCHAR) AS DOUBLE) / c30
                   - (CAST(s30 AS DOUBLE) / c30) * (CAST(s30 AS DOUBLE) / c30),
                   0.0)) AS vol30
        FROM framed
        ORDER BY day
    """,
    tags=("window",),
    doc="W2/W3 moving average + rolling volatility with ROWS frames — "
    "dbt fact_polls.sql:80-90, daily_poll_averages.sql:71-88. Window "
    "sums run over DECIMAL (exact in both engines); avg/stddev_pop are "
    "derived in double from those identical sums via identical IEEE ops, "
    "so results are bitwise engine-independent WITHOUT rounding — "
    "engine ROUND() implementations disagree on boundary values, and "
    "windowed float accumulators drift (sliding add/subtract). ss30's "
    "unscaled int exceeds 2^63, where DuckDB's decimal->double cast "
    "double-rounds, so it round-trips through VARCHAR (correctly-rounded "
    "parse in both engines).",
)
def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        )
        .cast("decimal(18,4)")
        .alias("rev")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    w30 = Window.orderBy("day").rowsBetween(-29, 0)
    rev = F.col("rev")
    framed = daily.select(
        "day",
        "rev",
        F.sum(rev).over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
        F.sum(rev).over(w30).alias("s30"),
        F.count(F.lit(1)).over(w30).alias("c30"),
        F.sum(rev.cast("decimal(19,4)") * rev).over(w30).alias("ss30"),
    )
    s30d, c30 = F.col("s30").cast("double"), F.col("c30")
    return (
        framed.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            rev.cast("double").alias("revenue"),
            (F.col("s7").cast("double") / F.col("c7")).alias("ma7"),
            (s30d / c30).alias("ma30"),
            F.sqrt(
                F.greatest(
                    F.col("ss30").cast("string").cast("double") / c30
                    - (s30d / c30) * (s30d / c30),
                    F.lit(0.0),
                )
            ).alias("vol30"),
        )
        .orderBy("day")
    )


@register(
    "latest_order",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderstatus,
               ROUND(o_totalprice, 4) AS o_totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
        ORDER BY o_custkey
    """,
    tags=("window", "dedup"),
    doc="W4/W8 row_number()=1 latest-row selection — the canonical "
    "ReplacingMergeTree/argMax emulation; streamlit 4_Topic_Terms.py:98-123, "
    "dbt fact_polls.sql:93-102.",
)
def latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        latest_wins(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
        .orderBy("o_custkey")
    )


@register(
    "nth_value_prev",
    oracle="""
        SELECT o_custkey,
               MAX(CASE WHEN rn = 1 THEN o_orderkey END) AS latest_orderkey,
               ROUND(MAX(CASE WHEN rn = 1 THEN o_totalprice END), 4) AS latest_price,
               ROUND(MAX(CASE WHEN rn = 2 THEN o_totalprice END), 4) AS prev_price
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        )
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    tags=("window",),
    doc="W5 nth_value(value, 2) previous-observation — dbt "
    "latest_poll_standings.sql:25-33. Expressed as rank-then-pivot, which "
    "is the deterministic equivalent (nth_value over an unbounded-preceding "
    "frame yields the same rows).",
)
def nth_value_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    return (
        ranked.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("o_orderkey"))).alias(
                "latest_orderkey"
            ),
            F.round(
                F.max(F.when(F.col("rn") == 1, F.col("o_totalprice"))), 4
            ).alias("latest_price"),
            F.round(
                F.max(F.when(F.col("rn") == 2, F.col("o_totalprice"))), 4
            ).alias("prev_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "rank_share",
    oracle="""
        WITH totals AS (
            SELECT o_custkey, SUM(o_totalprice) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey,
               ROUND(revenue, 4) AS revenue,
               n_orders,
               ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey) AS revenue_rank,
               ROUND(revenue / SUM(revenue) OVER () * 100, 6) AS revenue_share_pct
        FROM totals
        ORDER BY revenue_rank
    """,
    tags=("window",),
    doc="W6 global rank + W7 share-of-total over an empty window — dbt "
    "latest_poll_standings.sql:87-95. Single-partition window: fine after "
    "the group-by collapses to |customers| rows (documented skew caveat).",
)
def rank_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_ops import global_rank

    o = table(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders")
    )
    # distributed global rank (range-repartition + local rank + offset
    # join) and a broadcast scalar total instead of the empty-window
    # forms, which would both collapse the table onto a single task —
    # result-identical, see operators/dedup_ops.global_rank
    total = totals.agg(F.sum("revenue").alias("_tot"))
    ranked = global_rank(
        totals,
        [F.desc("revenue"), F.asc("o_custkey")],
        rank_name="revenue_rank",
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            F.round("revenue", 4).alias("revenue"),
            "n_orders",
            "revenue_rank",
            F.round(F.col("revenue") / F.col("_tot") * 100, 6).alias(
                "revenue_share_pct"
            ),
        )
        .orderBy("revenue_rank")
    )


@register(
    "sessionize",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR DATEDIFF('second', prev_ts, ts) > 1800
                           THEN 1 ELSE 0 END AS is_new
            FROM seq
        ), sess AS (
            SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    tags=("window", "sessionize"),
    doc="Sessionization (gap > 30 min): lag + cumulative-sum window — the "
    "batch rendition of the reference's run/watch grouping (SURVEY §2.11); "
    "streaming variant uses session_window in streaming/events.py.",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_ord)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(w_cum)
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "ntile_deciles",
    oracle="""
        WITH ranked AS (
            SELECT c_mktsegment AS segment, c_acctbal,
                   NTILE(10) OVER w AS decile,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pr,
                   ROUND(CUME_DIST() OVER w, 6) AS cd
            FROM customer
            WINDOW w AS (
                PARTITION BY c_mktsegment
                ORDER BY c_acctbal, c_custkey)
        )
        SELECT segment, decile, COUNT(*) AS n,
               ROUND(MIN(c_acctbal), 2) AS lo,
               ROUND(MAX(c_acctbal), 2) AS hi,
               ROUND(AVG(pr), 6) AS avg_pr,
               ROUND(MAX(cd), 6) AS max_cd
        FROM ranked
        GROUP BY segment, decile
        ORDER BY segment, decile
    """,
    tags=("window", "rank"),
    doc="Distribution-rank window family: ntile(10) decile assignment "
    "plus percent_rank / cume_dist within each market segment, rolled "
    "up to per-(segment, decile) boundaries. The ordering includes "
    "c_custkey so every rank is tie-free and engine-deterministic. "
    "Scale note: the partition key has fixed cardinality (5 segments), "
    "so the direct window serializes each segment onto one task at "
    "100 TB — the scale path is the global_rank/topk_per_group "
    "two-phase construction per segment, or quantile-boundary "
    "assignment (9 percentile cuts per segment, broadcast, then a "
    "map-only bucket lookup), which this query's decile-boundary "
    "OUTPUT is exactly shaped for.",
)
def ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
    return (
        ranked.groupBy("segment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
            F.round(F.avg("pr"), 6).alias("avg_pr"),
            F.round(F.max("cd"), 6).alias("max_cd"),
        )
        .orderBy("segment", "decile")
    )


_RANGE_FRAME_SEC = 3600  # trailing 1 h


@register(
    "range_frame_avg",
    oracle=f"""
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER w, 6) AS avg_1h,
               COUNT(*) OVER w AS n_in_window
        FROM (
            SELECT event_id, user_id, value,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec FROM events
        )
        WINDOW w AS (
            PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN {_RANGE_FRAME_SEC} PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    tags=("window", "events"),
    doc=f"Time-RANGE window frame — trailing {_RANGE_FRAME_SEC}-second "
    "per-user average, the interval counterpart of moving_avg's "
    "ROWS frame. The frame is defined on epoch seconds (floored "
    "identically on both engines), so rows landing in the same second "
    "form one peer group and the frame content is order-independent — "
    "no tie-break needed for determinism, unlike ROWS frames. "
    "Partitioned by user_id (high cardinality): each partition sorts "
    "locally and the running frame is evaluated in one pass with a "
    "sliding aggregate state, never a per-row rescan.",
)
def range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_RANGE_FRAME_SEC, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), 6).alias("avg_1h"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("event_id")
    )


@register(
    "forward_fill",
    oracle="""
        WITH masked AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_id % 4 = 1 THEN NULL ELSE value END AS v
            FROM events
        )
        SELECT event_id, user_id,
               ROUND(LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   4) AS filled
        FROM masked
        ORDER BY event_id
    """,
    tags=("window", "events"),
    doc="Forward-fill (last-observation-carried-forward) gap "
    "interpolation: a deterministic 1-in-4 slice of readings is "
    "NULLed, then each user's series is repaired with "
    "last(value, ignorenulls) over an unbounded-preceding row frame — "
    "the time-series repair step between ingest and feature "
    "extraction. Leading NULLs (no prior observation) stay NULL on "
    "both engines. One window over the high-cardinality user key; the "
    "running last-non-null state is O(1) per row, so the pass stays a "
    "single sort-free-aggregate sweep per partition at any scale.",
)
def forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 4 == 1, F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            "user_id",
            F.round(F.last("v", ignorenulls=True).over(w), 4).alias(
                "filled"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "session_window_agg",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts, value,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), flagged AS (
            -- microsecond-exact gap compare (ts - prev_ts is a full-
            -- precision INTERVAL): DATEDIFF('second', ...) would
            -- truncate, so a 1800.5 s gap would merge here while
            -- Spark's session_window splits — latent hash break on
            -- any fixture containing such a gap (sessionize is safe:
            -- it second-truncates on BOTH sides)
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL '30 minutes'
                           THEN 1 ELSE 0 END AS is_new
            FROM seq
        ), sess AS (
            SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    tags=("window", "sessionize", "aggregate"),
    doc="Native session_window sessionization in BATCH: one "
    "groupBy(user, session_window(ts, '30 minutes')) — Spark merges "
    "events whose windows overlap (gap <= 30 min; verified: a gap of "
    "exactly 1800 s merges, 1801 splits, and end = last_ts + gap), so "
    "no lag/cumsum window chain is needed at all. The oracle is the "
    "equivalent cumsum construction. Compared to `sessionize` this is "
    "the operator a Spark user should reach for: a single "
    "session-merging hash aggregate (partial merge on the map side) "
    "instead of two analytic windows, and the identical code runs "
    "under readStream with a watermark (streaming/events.py).",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )
