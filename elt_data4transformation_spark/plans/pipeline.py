"""Study-pipeline operators (SURVEY §2.9 / §2.4): regex claim
extraction (T1), rule-based topic scoring (T3), auto-review policy
(T13), citation-graph follow (T14), eval metrics (A12), domain audit
(A14), LLM-attribution parse + grounding checks (T10), and the dbt
coalition-combination generator.

The reference extracts claims from German prose; the driver's
`documents` table is numeric-free word soup, so claim text is
constructed deterministically from `orders` numerics *inside the
query* (both twins build the identical text), which keeps the
regex/parse machinery honest while staying oracle-checkable.

All plans are pure built-in expressions — JVM-side, codegen-friendly,
no Python in the hot path. At 100 TB each of these is an
embarrassingly parallel projection (or a projection + one hash
aggregate); no shuffles beyond the final group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as sql_types

from ..functions import claims, parsing
from ..sources import spread, table
from .registry import register

# --- T1: regex claim extraction ------------------------------------------
# Reference: study_scraper/claims.py:57-76 (percent + n= regexes, German
# number forms), :109-213 (all-matches extraction, snippet windows,
# per-span dedup, >120% suppression). Full machinery lives in
# functions/claims.py; here we build a deterministic multi-claim German
# corpus from orders numerics (both twins build the identical text) and
# run the extractor over it.

_UNIT_FORMS = ("%", " Prozent", " v.H.", " vom Hundert", " Prozentpunkte")


def _de_tenths_sql(expr: str) -> str:
    """German one-decimal number 'NN,N' from a tenths integer (SQL)."""
    return f"CAST(({expr}) // 10 AS VARCHAR) || ',' || CAST(({expr}) % 10 AS VARCHAR)"


def _de_tenths_col(tenths: F.Column) -> F.Column:
    return F.concat(
        F.floor(tenths / 10).cast("long").cast("string"),
        F.lit(","),
        (tenths % 10).cast("string"),
    )


def _unit_sql(idx_expr: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{u}'" for i, u in enumerate(_UNIT_FORMS)
    )
    return f"CASE {idx_expr} {whens} END"


def _unit_form_col(idx: F.Column) -> F.Column:
    return F.element_at(
        F.array(*[F.lit(u) for u in _UNIT_FORMS]), (idx + 1).cast("int")
    )


def _claim_text_sql() -> str:
    """Multi-claim German study text from orders numerics (DuckDB twin):
    two percent claims with rotating unit spellings (incl. no-space '%',
    v.H., vom Hundert, Prozentpunkte), an n= sample-size cue in German
    thousands or plain form, and a bare year token (must NOT match)."""
    n = "(30 + (o_custkey * 7) % 10000)"
    n_de = (
        f"CASE WHEN {n} >= 1000 THEN CAST({n} // 1000 AS VARCHAR) || '.' || "
        f"LPAD(CAST({n} % 1000 AS VARCHAR), 3, '0') "
        f"ELSE CAST({n} AS VARCHAR) END"
    )
    return (
        "'Studie ' || o_orderkey || ': Die Zustimmung lag bei ' || "
        f"{_de_tenths_sql('o_orderkey % 1301')} || "
        f"{_unit_sql('o_orderkey % 5')} || "
        "' der Befragten, während ' || "
        f"{_de_tenths_sql('(o_orderkey * 7 + 3) % 997')} || "
        f"{_unit_sql('(o_orderkey // 5) % 5')} || "
        "' der Wähler dies ablehnen (' || "
        "CASE WHEN o_custkey % 2 = 0 THEN 'n=' ELSE 'n = ' END || "
        f"{n_de} || "
        "'). Seit 2021 bleibt die Mehrheit stabil. Quelle: Institut ' || "
        "(o_custkey % 7) || '.'"
    )


def _claim_text_col() -> F.Column:
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    n_raw = F.lit(30) + (c * 7) % 10000
    n_de = F.when(
        n_raw >= 1000,
        F.concat(
            F.floor(n_raw / 1000).cast("long").cast("string"),
            F.lit("."),
            F.lpad((n_raw % 1000).cast("string"), 3, "0"),
        ),
    ).otherwise(n_raw.cast("string"))
    return F.concat(
        F.lit("Studie "),
        k.cast("string"),
        F.lit(": Die Zustimmung lag bei "),
        _de_tenths_col(k % 1301),
        _unit_form_col(k % 5),
        F.lit(" der Befragten, während "),
        _de_tenths_col((k * 7 + 3) % 997),
        _unit_form_col(F.floor(k / 5).cast("long") % 5),
        F.lit(" der Wähler dies ablehnen ("),
        F.when(c % 2 == 0, F.lit("n=")).otherwise(F.lit("n = ")),
        n_de,
        F.lit("). Seit 2021 bleibt die Mehrheit stabil. Quelle: Institut "),
        (c % 7).cast("string"),
        F.lit("."),
    )


@register(
    "claims_extract",
    oracle=f"""
        SELECT * FROM ({claims.claims_from_text_sql(
            f"SELECT o_orderkey AS study_id, {_claim_text_sql()} AS text FROM orders"
        )})
        ORDER BY study_id, claim_id
    """,
    tags=("text", "pipeline"),
    doc="T1 regex claim extraction at full reference surface "
    "(study_scraper/claims.py:57-76, 109-213): ALL matches per document "
    "over the complete German unit alternation (%, Prozent, "
    "Prozentpunkt(e)->pp, v.H., vom Hundert, case-insensitive), German "
    "number parsing with the 3-digit thousands heuristic, n= sample "
    "cues, per-span dedup, +-90-char word-boundary snippets, >120% "
    "suppression (which subsumes the year-token filter), and stable "
    "sha256 claim ids. Claim text is built from orders numerics "
    "in-query (both twins identical); machinery in functions/claims.py. "
    "Pure projection + explode — no shuffle at any scale beyond the "
    "final ordering.",
)
def claims_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regex-heavy per-row work: spread the single-file scan across cores
    o = spread(table(spark, sf_dir, "orders"))
    src = o.select(
        F.col("o_orderkey").alias("study_id"), _claim_text_col().alias("text")
    )
    return claims.claims_from_text_df(src).orderBy("study_id", "claim_id")


# --- T3: rule-based topic scoring ----------------------------------------
# Reference: study_scraper/topic_filter.py:62-115 (include 0.2 ea cap
# 0.4, synonym 0.1 ea cap 0.2, exclude short-circuits to 0);
# pipeline/topic_classifier.py:363-367 (dataset-id glob hint +0.5).

TOPICS: tuple[tuple[str, tuple[str, ...], tuple[str, ...], tuple[str, ...], str], ...] = (
    # (topic_id, include, synonyms, exclude, source_hint_prefix)
    ("performance", ("fast", "slow"), ("scan", "batch"), (), "src1"),
    ("storage", ("table", "row"), ("column", "part"), ("stream",), ""),
    ("streaming", ("stream", "window"), ("batch", "join"), (), ""),
)


def _topic_score_sql(inc: tuple[str, ...], syn: tuple[str, ...],
                     exc: tuple[str, ...], hint: str) -> str:
    def hits(terms: tuple[str, ...]) -> str:
        lst = ", ".join(f"'{t}'" for t in terms)
        return (
            f"LEN(LIST_FILTER([{lst}], "
            f"t -> LIST_CONTAINS(STRING_SPLIT(text, ' '), t)))"
        )

    base = (
        f"LEAST(0.2 * {hits(inc)}, 0.4) + LEAST(0.1 * {hits(syn)}, 0.2)"
    )
    if hint:
        base = f"({base}) + CASE WHEN source LIKE '{hint}%' THEN 0.5 ELSE 0 END"
    if exc:
        return f"CASE WHEN {hits(exc)} > 0 THEN 0.0 ELSE {base} END"
    return base


def _topic_score_col(inc: tuple[str, ...], syn: tuple[str, ...],
                     exc: tuple[str, ...], hint: str) -> F.Column:
    words = F.split(F.col("text"), " ")

    def hits(terms: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(t) for t in terms])
        return F.size(F.filter(arr, lambda t: F.array_contains(words, t)))

    base = F.least(0.2 * hits(inc), F.lit(0.4)) + F.least(
        0.1 * hits(syn), F.lit(0.2)
    )
    if hint:
        base = base + F.when(
            F.col("source").startswith(hint), F.lit(0.5)
        ).otherwise(F.lit(0.0))
    if exc:
        return F.when(hits(exc) > 0, F.lit(0.0)).otherwise(base)
    return base


def _topic_oracle() -> str:
    branches = []
    for tid, inc, syn, exc, hint in TOPICS:
        branches.append(
            f"SELECT doc_id, '{tid}' AS topic_id, "
            f"ROUND({_topic_score_sql(inc, syn, exc, hint)}, 4) AS score "
            f"FROM documents"
        )
    union = " UNION ALL ".join(branches)
    return f"""
        WITH scored AS ({union})
        SELECT doc_id, topic_id, score,
               CASE WHEN score >= 0.5 THEN 'selected'
                    WHEN score >= 0.25 THEN 'review'
                    ELSE 'excluded' END AS decision
        FROM scored
        WHERE score > 0
        ORDER BY doc_id, topic_id
    """


@register(
    "topic_score",
    oracle=_topic_oracle(),
    tags=("text", "pipeline"),
    doc="T3 rule-based topic scoring: include terms 0.2 each capped at "
    "0.4, synonyms 0.1 capped 0.2, exclude terms short-circuit to 0, "
    "source-glob hint +0.5, then three-way selected/review/excluded "
    "routing (study_scraper/topic_filter.py:62-115; "
    "pipeline/topic_classifier.py:329-413). Broadcast-style constant "
    "topic table unrolled into column expressions — no join, no UDF.",
)
def topic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    branches = [
        d.select(
            "doc_id",
            F.lit(tid).alias("topic_id"),
            F.round(_topic_score_col(inc, syn, exc, hint), 4).alias("score"),
        )
        for tid, inc, syn, exc, hint in TOPICS
    ]
    scored = branches[0]
    for b in branches[1:]:
        scored = scored.unionByName(b)
    return (
        scored.filter(F.col("score") > 0)
        .withColumn(
            "decision",
            F.when(F.col("score") >= 0.5, "selected")
            .when(F.col("score") >= 0.25, "review")
            .otherwise("excluded"),
        )
        .orderBy("doc_id", "topic_id")
    )


# --- T13: auto-review policy ---------------------------------------------


@register(
    "auto_review",
    oracle="""
        WITH decided AS (
            SELECT o_orderkey,
                   CASE
                     WHEN o_orderstatus = 'F' AND o_totalprice < 50000
                       THEN 'rejected:low_value_finished'
                     WHEN o_orderpriority = '1-URGENT' THEN 'kept:urgent'
                     WHEN o_totalprice > 300000 THEN 'kept:high_value'
                     WHEN EXTRACT(YEAR FROM o_orderdate) < 1996
                       THEN 'rejected:stale'
                     ELSE 'review:default'
                   END AS outcome
            FROM orders
        )
        SELECT STRING_SPLIT(outcome, ':')[1] AS decision,
               STRING_SPLIT(outcome, ':')[2] AS rationale,
               COUNT(*) AS n_orders,
               ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 4) AS pct
        FROM decided
        GROUP BY outcome
        ORDER BY decision, rationale
    """,
    tags=("pipeline",),
    doc="T13 auto-review policy: deterministic first-match rule chain "
    "over pending items -> kept/rejected/review with rationale, plus "
    "outcome distribution (study_scraper/auto_review.py, rule fn over "
    "pending studies). A when-chain projection + one hash aggregate.",
)
def auto_review(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    outcome = (
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000),
            "rejected:low_value_finished",
        )
        .when(F.col("o_orderpriority") == "1-URGENT", "kept:urgent")
        .when(F.col("o_totalprice") > 300000, "kept:high_value")
        .when(F.year("o_orderdate") < 1996, "rejected:stale")
        .otherwise("review:default")
    )
    from pyspark.sql import Window

    counted = (
        o.select(outcome.alias("outcome"))
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = Window.partitionBy()
    return (
        counted.select(
            F.split("outcome", ":").getItem(0).alias("decision"),
            F.split("outcome", ":").getItem(1).alias("rationale"),
            "n_orders",
            F.round(
                100.0 * F.col("n_orders") / F.sum("n_orders").over(total), 4
            ).alias("pct"),
        )
        .orderBy("decision", "rationale")
    )


# --- T14: citation-graph follow ------------------------------------------


@register(
    "citation_follow",
    oracle="""
        WITH ingested AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate < DATE '1997-01-01'
        ), refs AS (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= DATE '1997-01-01'
              AND o_orderdate < DATE '1998-01-01'
        )
        SELECT r.o_custkey AS frontier_id, COUNT(*) AS ref_count
        FROM refs r
        WHERE NOT EXISTS (
            SELECT 1 FROM ingested i WHERE i.o_custkey = r.o_custkey
        )
        GROUP BY r.o_custkey
        ORDER BY ref_count DESC, frontier_id
        LIMIT 100
    """,
    tags=("pipeline", "join"),
    doc="T14 citation-graph follow: one-hop expansion of referenced ids "
    "minus the already-ingested set, ranked by reference count "
    "(study_scraper/follow.py: explode(refs) -> anti-join vs ingested). "
    "Left-anti hash join + aggregate; the ingested side broadcasts when "
    "small, otherwise both sides shuffle on the id — no cross join.",
)
def citation_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    ingested = o.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_custkey"
    ).distinct()
    refs = o.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return (
        refs.join(ingested, "o_custkey", "left_anti")
        .groupBy(F.col("o_custkey").alias("frontier_id"))
        .agg(F.count(F.lit(1)).alias("ref_count"))
        .orderBy(F.desc("ref_count"), "frontier_id")
        .limit(100)
    )


# --- A12: eval metrics (gold-set harness) --------------------------------

_GOLD_SQL = "CAST(REGEXP_EXTRACT(props, '\"k\": ([0-9]+)', 1) AS INTEGER) >= 50"
_PRED_SQL = "value >= 10.0"


@register(
    "eval_metrics",
    oracle=f"""
        WITH labeled AS (
            SELECT event_type,
                   CASE WHEN {_GOLD_SQL} THEN 1 ELSE 0 END AS gold,
                   CASE WHEN {_PRED_SQL} THEN 1 ELSE 0 END AS pred
            FROM events
        ), cm AS (
            SELECT event_type,
                   CAST(SUM(gold * pred) AS BIGINT) AS tp,
                   CAST(SUM((1 - gold) * pred) AS BIGINT) AS fp,
                   CAST(SUM(gold * (1 - pred)) AS BIGINT) AS fn,
                   CAST(SUM((1 - gold) * (1 - pred)) AS BIGINT) AS tn
            FROM labeled GROUP BY event_type
        )
        SELECT event_type, tp, fp, fn, tn,
               ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
               ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
               ROUND(2.0 * tp / NULLIF(2 * tp + fp + fn, 0), 6) AS f1
        FROM cm
        ORDER BY event_type
    """,
    tags=("pipeline", "agg"),
    doc="A12 gold-set eval harness: confusion matrix + precision / "
    "recall / F1 per group, gold labels pulled from a JSON props column "
    "(study_scraper/eval/harness.py:52-151: capture-rate, precision, "
    "hallucination-rate over gold JSONL). One projection + hash agg.",
)
def eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    gold = (
        F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("int") >= 50
    ).cast("int")
    pred = (F.col("value") >= 10.0).cast("int")
    labeled = e.select(
        "event_type", gold.alias("gold"), pred.alias("pred")
    )
    cm = labeled.groupBy("event_type").agg(
        F.sum(F.col("gold") * F.col("pred")).alias("tp"),
        F.sum((1 - F.col("gold")) * F.col("pred")).alias("fp"),
        F.sum(F.col("gold") * (1 - F.col("pred"))).alias("fn"),
        F.sum((1 - F.col("gold")) * (1 - F.col("pred"))).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return (
        cm.select(
            "event_type",
            "tp",
            "fp",
            "fn",
            "tn",
            F.round(tp.cast("double") / F.nullif(tp + fp, F.lit(0)), 6).alias(
                "precision"
            ),
            F.round(tp.cast("double") / F.nullif(tp + fn, F.lit(0)), 6).alias(
                "recall"
            ),
            F.round(
                2.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0)), 6
            ).alias("f1"),
        )
        .orderBy("event_type")
    )


# --- A14: domain frequency audit -----------------------------------------

_KNOWN_DOMAINS = ("example.com",)


@register(
    "domain_audit",
    oracle=f"""
        WITH urls AS (
            SELECT doc_id, source,
                   CASE
                     WHEN doc_id % 3 = 0
                       THEN 'https://www.' || source || '-data.org/d/' || doc_id
                     WHEN doc_id % 3 = 1
                       THEN 'https://cdn.assets.' || source || '.net/f/' || doc_id
                     ELSE 'http://' || source || '.example.com/x'
                   END AS url
            FROM documents
        ), hosts AS (
            SELECT source,
                   STRING_SPLIT(REGEXP_EXTRACT(url, '^https?://([^/]+)', 1), '.')
                       AS labels
            FROM urls
        ), doms AS (
            SELECT source, labels[-2] || '.' || labels[-1] AS domain
            FROM hosts
        )
        SELECT domain, COUNT(*) AS n_urls,
               COUNT(DISTINCT source) AS n_sources
        FROM doms
        WHERE domain NOT IN ({", ".join(f"'{d}'" for d in _KNOWN_DOMAINS)})
        GROUP BY domain
        ORDER BY n_urls DESC, domain
    """,
    tags=("pipeline", "text"),
    doc="A14 domain frequency audit: registrable-domain extraction "
    "(host regexp -> last two dot-labels) + frequency ranking minus a "
    "known-domain set (study_scraper/domain_audit.py: registrable-domain "
    "extraction + ranking minus known). Projection + hash agg; the "
    "known-set filter is a constant IN-list, no join needed.",
)
def domain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("https://www."),
                F.col("source"),
                F.lit("-data.org/d/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("https://cdn.assets."),
                F.col("source"),
                F.lit(".net/f/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(F.lit("http://"), F.col("source"), F.lit(".example.com/x"))
        )
    )
    labels = F.split(F.regexp_extract(url, r"^https?://([^/]+)", 1), r"\.")
    domain = F.concat(
        F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
    )
    return (
        d.select("source", domain.alias("domain"))
        .filter(~F.col("domain").isin(*_KNOWN_DOMAINS))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy(F.desc("n_urls"), "domain")
    )


# --- T10: LLM attribution parse + grounding / distribution checks --------

_ATTR_SCHEMA = sql_types.StructType(
    [
        sql_types.StructField("question", sql_types.StringType()),
        sql_types.StructField("position", sql_types.StringType()),
        sql_types.StructField("percentage", sql_types.DoubleType()),
        sql_types.StructField("confidence", sql_types.DoubleType()),
        sql_types.StructField("source_span", sql_types.StringType()),
    ]
)

_POSITIONS = ("support", "oppose", "neutral", "unspecified")


def attribution_postprocess(resp: "DataFrame") -> "DataFrame":
    """The T10 parse + post-check half, shared by the offline round-trip
    (llm_attribution_parse below) and the LIVE batched-call path
    (operators/llm_batch.llm_annotate_batched — integration-tested over
    a localhost socket in tests/test_live_fetch.py): ``resp`` carries
    (doc_id, text, response_json); the response is parsed against the
    strict schema (the reference validates against a JSON schema —
    from_json with a StructType is the analog, llm_v1.py:216-312), then
    grounding (span must be a substring of the source text, else
    confidence capped at 0.3) and the per-question distribution check
    (sum <= 120%) run as column ops."""
    from pyspark.sql import Window

    parsed = resp.select(
        "doc_id",
        "text",
        F.from_json("response_json", _ATTR_SCHEMA).alias("a"),
    ).select("doc_id", "text", "a.*")
    grounded = F.col("text").contains(F.col("source_span"))
    confidence = F.when(grounded, F.col("confidence")).otherwise(
        F.least(F.col("confidence"), F.lit(0.3))
    )
    checked = parsed.select(
        "doc_id",
        "question",
        "position",
        "percentage",
        grounded.alias("grounded"),
        F.round(confidence, 2).alias("confidence"),
    )
    qw = Window.partitionBy("question")
    return checked.withColumn(
        "dist_ok", F.sum("percentage").over(qw) <= 120.0
    ).orderBy("doc_id")


@register(
    "llm_attribution_parse",
    oracle=f"""
        WITH resp AS (
            SELECT doc_id, text,
                   CONCAT_WS(' ', STRING_SPLIT(text, ' ')[1],
                             STRING_SPLIT(text, ' ')[2],
                             STRING_SPLIT(text, ' ')[3]) AS question,
                   ['support','oppose','neutral','unspecified']
                       [doc_id % 4 + 1] AS position,
                   CAST((doc_id * 13) % 130 AS DOUBLE) AS percentage,
                   ((doc_id % 10) + 1) / 10.0 AS conf_raw,
                   CASE WHEN doc_id % 5 = 0
                        THEN SUBSTRING(text, 1, 40) || ' XZQ'
                        ELSE SUBSTRING(text, 1, 40) END AS source_span
            FROM documents
        ), checked AS (
            SELECT doc_id, question, position, percentage, source_span,
                   CONTAINS(text, source_span) AS grounded,
                   CASE WHEN CONTAINS(text, source_span) THEN conf_raw
                        ELSE LEAST(conf_raw, 0.3) END AS confidence
            FROM resp
        )
        SELECT doc_id, question, position, percentage,
               grounded, ROUND(confidence, 2) AS confidence,
               SUM(percentage) OVER (PARTITION BY question) <= 120.0
                   AS dist_ok
        FROM checked
        ORDER BY doc_id
    """,
    tags=("pipeline", "text", "json"),
    doc="T10 LLM attribution extraction, offline-parse path: a JSON "
    "response column is built with to_json and parsed back with "
    "from_json (schema-checked), then the reference's post-checks run as "
    "column ops: grounding = span-substring-of-source else confidence "
    "capped at 0.3, per-question distribution sum <= 120% "
    "(study_scraper/extractors/llm_v1.py:216-312). Live calls to a "
    "real provider are out of scope, as in the reference's own tests — "
    "but the batched CALL SHAPE is real and socket-proven (round 10): "
    "operators/llm_batch.llm_annotate_batched posts Arrow-batched "
    "prompts (one rate-limited, retrying fetcher per task) and its "
    "responses feed the SAME attribution_postprocess used here, "
    "integration-tested against a localhost messages-shaped server "
    "(tests/test_live_fetch.py). Projection + one window over question.",
)
def llm_attribution_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    w = F.split(F.col("text"), " ")
    question = F.concat_ws(
        " ", w.getItem(0), w.getItem(1), w.getItem(2)
    )
    position = F.array(*[F.lit(p) for p in _POSITIONS])[
        (F.col("doc_id") % 4).cast("int")
    ]
    span = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.substring("text", 1, 40), F.lit(" XZQ")),
    ).otherwise(F.substring("text", 1, 40))
    # Round-trip through JSON: serialize the model "response", parse it
    # back with an explicit schema (the reference validates against a
    # JSON schema; from_json with a strict StructType is the analog).
    resp = d.select(
        "doc_id",
        "text",
        F.to_json(
            F.struct(
                question.alias("question"),
                position.alias("position"),
                ((F.col("doc_id") * 13) % 130)
                .cast("double")
                .alias("percentage"),
                (((F.col("doc_id") % 10) + 1) / 10.0).alias("confidence"),
                span.alias("source_span"),
            )
        ).alias("response_json"),
    )
    return attribution_postprocess(resp)


# --- dbt macro: coalition combination generator --------------------------


@register(
    "coalition_combinations",
    oracle="""
        WITH shares AS (
            SELECT o_orderpriority AS party,
                   ROUND(100.0 * SUM(o_totalprice) /
                         SUM(SUM(o_totalprice)) OVER (), 4) AS share
            FROM orders GROUP BY o_orderpriority
        ), pairs AS (
            SELECT a.party || '+' || b.party AS coalition,
                   2 AS n_parties,
                   ROUND(a.share + b.share, 4) AS combined_share
            FROM shares a JOIN shares b ON a.party < b.party
        ), triples AS (
            SELECT a.party || '+' || b.party || '+' || c.party AS coalition,
                   3 AS n_parties,
                   ROUND(a.share + b.share + c.share, 4) AS combined_share
            FROM shares a
            JOIN shares b ON a.party < b.party
            JOIN shares c ON b.party < c.party
        )
        SELECT coalition, n_parties, combined_share,
               combined_share >= 50.0 AS feasible
        FROM (SELECT * FROM pairs UNION ALL SELECT * FROM triples)
        ORDER BY coalition
    """,
    tags=("pipeline", "generator"),
    doc="dbt generate_coalition_combinations macro: all 2- and 3-way "
    "party combinations with summed latest share and a >=50% feasibility "
    "flag (macros/political_data_macros.sql:175-193). The share table is "
    "a tiny aggregate; the combination self-joins broadcast it, so the "
    "generator costs one shuffle for the base aggregate regardless of "
    "fact-table scale.",
)
def coalition_combinations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    shares = (
        o.groupBy(F.col("o_orderpriority").alias("party"))
        .agg(F.sum("o_totalprice").alias("tot"))
        .select(
            "party",
            F.round(
                100.0 * F.col("tot") / F.sum("tot").over(Window.partitionBy()),
                4,
            ).alias("share"),
        )
    )
    a = shares.alias("a")
    b = shares.alias("b")
    c = shares.alias("c")
    pairs = (
        a.join(b, F.col("a.party") < F.col("b.party"))
        .select(
            F.concat_ws("+", "a.party", "b.party").alias("coalition"),
            F.lit(2).alias("n_parties"),
            F.round(F.col("a.share") + F.col("b.share"), 4).alias(
                "combined_share"
            ),
        )
    )
    triples = (
        a.join(b, F.col("a.party") < F.col("b.party"))
        .join(c, F.col("b.party") < F.col("c.party"))
        .select(
            F.concat_ws("+", "a.party", "b.party", "c.party").alias(
                "coalition"
            ),
            F.lit(3).alias("n_parties"),
            F.round(
                F.col("a.share") + F.col("b.share") + F.col("c.share"), 4
            ).alias("combined_share"),
        )
    )
    return (
        pairs.unionByName(triples)
        .withColumn("feasible", F.col("combined_share") >= 50.0)
        .orderBy("coalition")
    )


# --- T2: quantitative-signal cue heuristic --------------------------------

_CUES = ("befragten", "prozent", "umfrage", "stichprobe", "percent",
         "survey", "respondents", "sample")
# the documents corpus is English-ish word soup; add corpus words so the
# heuristic has positives to find at every scale factor
_CUES_ACTIVE = _CUES + ("data", "value")


@register(
    "quant_signal",
    oracle=f"""
        SELECT doc_id,
               {" OR ".join(f"CONTAINS(LOWER(text), '{c}')" for c in _CUES_ACTIVE)}
                   AS has_quant_signal,
               {" + ".join(f"CASE WHEN CONTAINS(LOWER(text), '{c}') THEN 1 ELSE 0 END" for c in _CUES_ACTIVE)}
                   AS n_cues
        FROM documents
        ORDER BY doc_id
    """,
    tags=("text", "pipeline"),
    doc="T2 quantitative-signal heuristic: cue-word boolean over the "
    "title+abstract text deciding whether a study is worth claim "
    "extraction (study_scraper/pipeline.py:36-64). Pure codegen "
    "projection; the cue list is a compile-time constant, no join.",
)
def quant_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    flags = [lowered.contains(c) for c in _CUES_ACTIVE]
    has = flags[0]
    for f in flags[1:]:
        has = has | f
    n = sum(f.cast("int") for f in flags[1:]) + flags[0].cast("int")
    return (
        d.select(
            "doc_id",
            has.alias("has_quant_signal"),
            n.alias("n_cues"),
        )
        .orderBy("doc_id")
    )
