"""Text-analysis queries over the `documents` table: language ID,
quality scoring, token counting, fingerprinting (the training-data
pipeline surface; reference analogs cited per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import textfns as T
from ..sources import spread, table
from .registry import register


def _langid_oracle() -> str:
    scores = ",\n               ".join(
        f"{T.stopword_hits_sql(lang)} AS score_{lang}" for lang in T.LANG_ORDER
    )
    best = "GREATEST(" + ", ".join(f"score_{l}" for l in T.LANG_ORDER) + ")"
    ladder = " ".join(
        f"WHEN score_{l} = best THEN '{l}'" for l in T.LANG_ORDER
    )
    return f"""
        WITH scored AS (
            SELECT doc_id, lang AS actual_lang,
               {scores}
            FROM documents
        ), best AS (
            SELECT *, {best} AS best FROM scored
        )
        SELECT doc_id, actual_lang,
               CASE WHEN best = 0 THEN 'und' {ladder} END AS predicted_lang,
               best AS best_score
        FROM best
        ORDER BY doc_id
    """


@register(
    "lang_id",
    oracle=_langid_oracle(),
    tags=("text",),
    doc="Language ID via stopword/n-gram hit counting, deterministic "
    "argmax with fixed precedence — training-data-pipeline op; reference "
    "analog: rule-based topic scoring study_scraper/topic_filter.py:62-115.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[T.stopword_hits_col(lang).alias(f"score_{lang}") for lang in T.LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in T.LANG_ORDER])
    pred = F.when(best == 0, "und")
    for lang in T.LANG_ORDER:
        pred = pred.when(F.col(f"score_{lang}") == best, lang)
    return (
        scored.withColumn("best", best)
        .select(
            "doc_id",
            "actual_lang",
            pred.alias("predicted_lang"),
            F.col("best").alias("best_score"),
        )
        .orderBy("doc_id")
    )


@register(
    "quality_score",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   LENGTH(text) AS n_chars_actual,
                   LEN(STRING_SPLIT(text, ' ')) AS n_words,
                   {T.stopword_hits_sql('en')} AS n_stopwords,
                   LEN(REGEXP_EXTRACT_ALL(text, '[^a-z0-9 ]')) AS n_punct
            FROM documents
        )
        SELECT doc_id, n_chars_actual, n_words,
               -- NULLIF guards: a zero-length doc would be NaN in Spark
               -- (double 0/0) but NULL in DuckDB; NULL on both sides
               ROUND(CAST(n_stopwords AS DOUBLE) / n_words, 6) AS stopword_ratio,
               ROUND(CAST(n_punct AS DOUBLE) / NULLIF(n_chars_actual, 0), 6)
                   AS punct_ratio,
               ROUND(LEAST(GREATEST(
                   0.3 * LEAST(n_words / 200.0, 1.0)
                 + 0.4 * LEAST(CAST(n_stopwords AS DOUBLE) / n_words * 5, 1.0)
                 + 0.3 * (1.0 - LEAST(CAST(n_punct AS DOUBLE)
                       / NULLIF(n_chars_actual, 0) * 10, 1.0)),
                   0.0), 1.0), 6) AS quality
        FROM feats
        ORDER BY doc_id
    """,
    tags=("text",),
    doc="Document quality scoring: length / stopword-ratio / punctuation-"
    "ratio heuristic with clamped weighted blend — training-data op; "
    "reference analogs: quantitative-signal cue heuristic "
    "study_scraper/pipeline.py:36-64, value sanity flags claims.py:173-177.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    n_words = F.size(T.words_col()).cast("long")
    feats = d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        n_words.alias("n_words"),
        T.stopword_hits_col("en").alias("n_stopwords"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0))
        .cast("long")
        .alias("n_punct"),
    )
    sw_ratio = F.col("n_stopwords").cast("double") / F.col("n_words")
    # nullif: Spark double 0/0 is NaN where DuckDB yields NULL — a
    # zero-length doc must be NULL on both sides (n_words can't be 0:
    # split('') is [''])
    punct_ratio = F.col("n_punct").cast("double") / F.nullif(
        F.col("n_chars_actual"), F.lit(0)
    )
    quality = F.least(
        F.greatest(
            0.3 * F.least(F.col("n_words") / 200.0, F.lit(1.0))
            + 0.4 * F.least(sw_ratio * 5, F.lit(1.0))
            + 0.3 * (1.0 - F.least(punct_ratio * 10, F.lit(1.0))),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return (
        feats.select(
            "doc_id",
            "n_chars_actual",
            "n_words",
            F.round(sw_ratio, 6).alias("stopword_ratio"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(quality, 6).alias("quality"),
        )
        .orderBy("doc_id")
    )


@register(
    "token_count",
    oracle="""
        SELECT doc_id,
               LEN(STRING_SPLIT(text, ' ')) AS ws_tokens,
               LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                   AS bpe_ish_tokens,
               CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS char_est_tokens
        FROM documents
        ORDER BY doc_id
    """,
    tags=("text",),
    doc="Token counting: whitespace tokens, BPE-ish regex tokens (letter "
    "runs / digit runs / single punctuation), chars/4 estimate — "
    "training-data op for budget accounting.",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.size(T.words_col()).cast("long").alias("ws_tokens"),
            F.size(
                F.regexp_extract_all(
                    "text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
                )
            )
            .cast("long")
            .alias("bpe_ish_tokens"),
            F.ceil(F.length("text") / 4.0).cast("long").alias("char_est_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "fingerprint",
    oracle=f"""
        WITH norm AS (
            SELECT doc_id,
                   MD5(LOWER(TRIM(REGEXP_REPLACE(text, ' +', ' ', 'g'))))
                       AS content_fp
            FROM documents
        ), sh AS (
            SELECT doc_id, {T.char_shingles_sql(8)} AS shingles
            FROM documents
        )
        SELECT norm.doc_id AS doc_id, norm.content_fp,
               {T.minhash_sql('sh.shingles', 0)} AS min_shingle_fp
        FROM norm JOIN sh ON norm.doc_id = sh.doc_id
        ORDER BY doc_id
    """,
    tags=("text", "hash"),
    doc="Document fingerprinting: md5 of whitespace-normalized text plus a "
    "min-wise 8-gram shingle fingerprint (rolling-hash analog) — "
    "reference analog: content-hash idempotency ingest.py:12-14.",
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    norm = F.md5(F.lower(F.trim(F.regexp_replace("text", " +", " "))))
    shingles = T.char_shingles_col(8)
    return (
        d.select(
            "doc_id",
            norm.alias("content_fp"),
            T.minhash_col(shingles, 0).alias("min_shingle_fp"),
        )
        .orderBy("doc_id")
    )


# --- corpus-cleaning composite (C4/RefinedWeb-style) ----------------------

_CLEAN_QUALITY_MIN = 0.5
_CLEAN_JACCARD = 0.5


@register(
    "corpus_clean_pipeline",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, text, source,
                   LEN(STRING_SPLIT(text, ' ')) AS n_words,
                   {T.langid_sql('text')} AS lang_pred,
                   {T.quality_sql('text')} AS q,
                   MD5(text) AS digest
            FROM documents
        ),
        gated AS (
            SELECT * FROM feats WHERE q >= {_CLEAN_QUALITY_MIN}
        ),
        exact_kept AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY digest
                           ORDER BY doc_id) AS drn
                FROM gated
            ) WHERE drn = 1
        ),
        grams AS (
            SELECT doc_id, lang_pred, {T.word_ngrams_sql(3, 'w')} AS grams
            FROM (SELECT doc_id, lang_pred, STRING_SPLIT(text, ' ') AS w
                  FROM exact_kept WHERE n_words >= 3)
        ),
        drops AS (
            SELECT DISTINCT b.doc_id AS drop_id
            FROM grams a JOIN grams b
              ON a.lang_pred = b.lang_pred AND a.doc_id < b.doc_id
            WHERE LEN(LIST_INTERSECT(a.grams, b.grams)) > 0
              AND CAST(LEN(LIST_INTERSECT(a.grams, b.grams)) AS DOUBLE)
                  / LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams)))
                  >= {_CLEAN_JACCARD}
        ),
        kept AS (
            SELECT e.* FROM exact_kept e
            LEFT JOIN drops d ON d.drop_id = e.doc_id
            WHERE d.drop_id IS NULL
        ),
        g_stats AS (
            SELECT lang_pred, source, COUNT(*) AS n_quality_pass
            FROM gated GROUP BY lang_pred, source
        ),
        e_stats AS (
            SELECT lang_pred, source, COUNT(*) AS n_after_exact
            FROM exact_kept GROUP BY lang_pred, source
        ),
        k_stats AS (
            SELECT lang_pred, source, COUNT(*) AS n_kept,
                   CAST(SUM(n_words) AS BIGINT) AS tokens_kept,
                   ROUND(AVG(q), 4) AS avg_quality_kept
            FROM kept GROUP BY lang_pred, source
        )
        SELECT g.lang_pred, g.source, g.n_quality_pass,
               COALESCE(e.n_after_exact, 0) AS n_after_exact,
               COALESCE(k.n_kept, 0) AS n_kept,
               COALESCE(e.n_after_exact, 0) - COALESCE(k.n_kept, 0)
                   AS n_neardup_dropped,
               COALESCE(k.tokens_kept, 0) AS tokens_kept,
               k.avg_quality_kept
        FROM g_stats g
        LEFT JOIN e_stats e USING (lang_pred, source)
        LEFT JOIN k_stats k USING (lang_pred, source)
        ORDER BY lang_pred, source
    """,
    tags=("text", "dedup", "composite"),
    doc="C4/RefinedWeb-style corpus-cleaning chain as ONE plan: "
    "language-ID (stopword argmax) -> quality gate (>= "
    f"{_CLEAN_QUALITY_MIN} on the length/stopword/punctuation blend) -> "
    "exact dedup (md5 digest, keep-first) -> near-dup removal (word-"
    f"3-gram Jaccard >= {_CLEAN_JACCARD} within predicted language via "
    "the sparse inverted-index join, drop the higher id) -> per-language "
    "kept-corpus stats. This is the operator sequence a training-data "
    "pipeline runs before tokenization; every stage is the independently "
    "oracle-checked primitive (lang_id, quality_score, dedup_exact, "
    "dedup_ngram_jaccard) composed end-to-end. Scale shape: two hash "
    "aggregates + one inverted-index join, all blocked/keyed — no "
    "cross join, no collect.",
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup_ops

    d = spread(table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        "text",
        "source",
        F.size(T.words_col()).cast("long").alias("n_words"),
        T.langid_col("text").alias("lang_pred"),
        T.quality_col("text").alias("q"),
        F.md5("text").alias("digest"),
    )
    # feats is regex-heavy (langid + quality stopword scans) and feeds
    # five consumers (exact dedup, grams, three stage aggregates) —
    # persist the gated subset so the projection runs once
    from pyspark import StorageLevel

    gated = feats.filter(F.col("q") >= _CLEAN_QUALITY_MIN).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # keep-first-per-digest as a min_by AGGREGATE, not a row_number
    # window: the hash aggregate partial-aggregates map-side (one
    # surviving row per digest per mapper crosses the exchange) and
    # never sorts, where the window shipped every row and sorted each
    # digest group (guide §2.3/§2.4). Same row set: lowest doc_id wins
    # per digest on both forms.
    cols = [c for c in gated.columns if c != "digest"]
    exact_kept = (
        gated.groupBy("digest")
        .agg(
            F.min_by(
                F.struct(*[F.col(c).alias(c) for c in cols]), F.col("doc_id")
            ).alias("_r")
        )
        .select("digest", *[F.col(f"_r.{c}").alias(c) for c in cols])
        .select(*gated.columns)
    )
    # split once into a named column — inlining the split() expression
    # into word_ngrams_col's element_at calls costs O(words^2) per doc
    grams = (
        exact_kept.filter(F.col("n_words") >= 3)
        .select("doc_id", "lang_pred", T.words_col().alias("w"))
        .select(
            "doc_id",
            "lang_pred",
            T.word_ngrams_col(3, F.col("w")).alias("grams"),
        )
    )
    pairs = dedup_ops.jaccard_pairs(
        grams, id_col="doc_id", set_col="grams", block_col="lang_pred"
    )
    drops = (
        pairs.filter(F.col("jac") >= _CLEAN_JACCARD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = exact_kept.join(drops, "doc_id", "left_anti")
    keys = ["lang_pred", "source"]
    g_stats = gated.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_quality_pass")
    )
    e_stats = exact_kept.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_after_exact")
    )
    k_stats = kept.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_words").alias("tokens_kept"),
        F.round(F.avg("q"), 4).alias("avg_quality_kept"),
    )
    return (
        g_stats.join(e_stats, keys, "left")
        .join(k_stats, keys, "left")
        .select(
            "lang_pred",
            "source",
            "n_quality_pass",
            F.coalesce("n_after_exact", F.lit(0)).alias("n_after_exact"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (
                F.coalesce("n_after_exact", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).alias("n_neardup_dropped"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
            "avg_quality_kept",
        )
        .orderBy("lang_pred", "source")
    )


# --- deterministic train/val/test split -----------------------------------

# hex-prefix buckets of md5(doc_id): 256 buckets compared as STRINGS
# (identical in both engines — no hex->int parsing portability trap).
# 'cc' = 204/256 = 79.7% train; 'e6' = 230/256 = 89.8% train+val.
_SPLIT_TRAIN_MAX = "cc"
_SPLIT_VAL_MAX = "e6"


@register(
    "dataset_split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, source,
                   LEN(STRING_SPLIT(text, ' ')) AS n_words,
                   SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
            FROM documents
        ),
        labeled AS (
            SELECT *,
                   CASE WHEN bucket < '{_SPLIT_TRAIN_MAX}' THEN 'train'
                        WHEN bucket < '{_SPLIT_VAL_MAX}' THEN 'val'
                        ELSE 'test' END AS split
            FROM assigned
        )
        SELECT split, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM labeled
        GROUP BY split, source
        ORDER BY split, source
    """,
    tags=("text", "composite"),
    doc="Deterministic train/val/test split for a training corpus: "
    "md5(doc_id) hex-prefix buckets compared as strings (engine-"
    "portable, no hex parsing), ~80/10/10, stable under corpus growth "
    "(a document's split never changes when rows are added — the "
    "property a training pipeline needs for leakage-free re-runs). "
    "Pure projection + one hash aggregate; at 100 TB the split column "
    "is computed in the scan projection and the write is "
    "partitionBy(split).",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    labeled = d.select(
        "doc_id",
        "source",
        F.size(T.words_col()).cast("long").alias("n_words"),
        F.when(bucket < _SPLIT_TRAIN_MAX, "train")
        .when(bucket < _SPLIT_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        labeled.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split", "source")
    )


# --- train/test decontamination check --------------------------------------

_DECON_NGRAM = 8


@register(
    "decontamination_check",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, source, text,
                   CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < '{_SPLIT_TRAIN_MAX}' THEN 'train'
                        WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < '{_SPLIT_VAL_MAX}' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
            WHERE LEN(STRING_SPLIT(text, ' ')) >= {_DECON_NGRAM}
        ),
        grams AS (
            SELECT doc_id, source, split,
                   UNNEST({T.word_ngrams_sql(_DECON_NGRAM, 'w')}) AS gram
            FROM (SELECT doc_id, source, split, STRING_SPLIT(text, ' ') AS w
                  FROM assigned)
        ),
        hits AS (
            SELECT t.doc_id, t.source,
                   COUNT(DISTINCT t.gram) AS n_shared_grams
            FROM (SELECT * FROM grams WHERE split = 'test') t
            JOIN (SELECT DISTINCT gram FROM grams WHERE split = 'train') tr
              ON t.gram = tr.gram
            GROUP BY t.doc_id, t.source
        ),
        test_docs AS (
            SELECT source, COUNT(*) AS n_test
            FROM assigned WHERE split = 'test' GROUP BY source
        ),
        contaminated AS (
            SELECT source, COUNT(*) AS n_contaminated,
                   CAST(SUM(n_shared_grams) AS BIGINT) AS total_shared_grams
            FROM hits GROUP BY source
        )
        SELECT d.source, d.n_test,
               COALESCE(c.n_contaminated, 0) AS n_contaminated,
               ROUND(100.0 * COALESCE(c.n_contaminated, 0) / d.n_test, 4)
                   AS contaminated_pct,
               COALESCE(c.total_shared_grams, 0) AS total_shared_grams
        FROM test_docs d LEFT JOIN contaminated c USING (source)
        ORDER BY source
    """,
    tags=("text", "dedup", "composite"),
    doc="Train/test decontamination check: a test document is "
    f"contaminated if it shares any exact word-{_DECON_NGRAM}-gram with "
    "any train document (the standard eval-leakage test applied before "
    "shipping a training corpus; split assignment reuses dataset_split's "
    "md5 buckets). Plan: explode distinct n-grams per split, sparse "
    "equi-join on the gram (only co-gram pairs materialize; the train "
    "side is deduplicated to distinct grams first so the join output is "
    "bounded by test-gram hits), per-source contamination stats. At "
    "100 TB the gram join shuffles on the gram; hot boilerplate grams "
    "get df-capped exactly like the near-dup index.",
)
def decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.size(T.words_col()) >= _DECON_NGRAM
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    assigned = d.select(
        "doc_id",
        "source",
        "text",
        F.when(bucket < _SPLIT_TRAIN_MAX, "train")
        .when(bucket < _SPLIT_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )
    # split once into a named column (same O(words^2) inlining trap)
    grams = assigned.select(
        "doc_id", "source", "split", T.words_col().alias("w")
    ).select(
        "doc_id",
        "source",
        "split",
        F.explode(T.word_ngrams_col(_DECON_NGRAM, F.col("w"))).alias("gram"),
    )
    train_grams = (
        grams.filter(F.col("split") == "train").select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("split") == "test")
        .join(train_grams, "gram")
        .groupBy("doc_id", "source")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )
    test_docs = (
        assigned.filter(F.col("split") == "test")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_test"))
    )
    contaminated = hits.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated"),
        F.sum("n_shared_grams").alias("total_shared_grams"),
    )
    return (
        test_docs.join(contaminated, "source", "left")
        .select(
            "source",
            "n_test",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                100.0 * F.coalesce("n_contaminated", F.lit(0)) / F.col("n_test"),
                4,
            ).alias("contaminated_pct"),
            F.coalesce("total_shared_grams", F.lit(0)).alias(
                "total_shared_grams"
            ),
        )
        .orderBy("source")
    )


# --- corpus bigram language model -----------------------------------------

_LM_MIN_COUNT = 3  # continuation must appear >= this many times
_LM_TOP_K = 3  # continuations kept per context


@register(
    "bigram_lm",
    oracle=f"""
        WITH w AS (
            SELECT STRING_SPLIT(text, ' ') AS w FROM documents
            WHERE LEN(STRING_SPLIT(text, ' ')) >= 2
        ), g AS (
            SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)),
                          i -> w[i] || ' ' || w[i + 1])) AS g
            FROM w
        ), p AS (
            SELECT SPLIT_PART(g, ' ', 1) AS context,
                   SPLIT_PART(g, ' ', 2) AS next_token
            FROM g
        ), pc AS (
            SELECT context, next_token,
                   CAST(COUNT(*) AS BIGINT) AS pair_n
            FROM p GROUP BY context, next_token
        ), cc AS (
            SELECT context, CAST(SUM(pair_n) AS BIGINT) AS ctx_n
            FROM pc GROUP BY context
        ), r AS (
            SELECT pc.context, pc.next_token, pc.pair_n, cc.ctx_n,
                   ROUND(CAST(pc.pair_n AS DOUBLE) / cc.ctx_n, 6) AS prob,
                   ROW_NUMBER() OVER (PARTITION BY pc.context
                       ORDER BY pc.pair_n DESC, pc.next_token) AS rnk
            FROM pc JOIN cc ON pc.context = cc.context
            WHERE pc.pair_n >= {_LM_MIN_COUNT}
        )
        SELECT context, next_token, pair_n, ctx_n, prob,
               CAST(rnk AS INTEGER) AS rnk
        FROM r WHERE rnk <= {_LM_TOP_K}
        ORDER BY context, rnk
    """,
    tags=("text", "lm"),
    doc="Corpus bigram language model: token-pair counts (NON-distinct "
    "— true occurrence counts, unlike the set-semantics dedup n-grams), "
    "per-context continuation probability, top-"
    f"{_LM_TOP_K} continuations with support >= {_LM_MIN_COUNT} — the "
    "n-gram-count stage every LM-data pipeline runs for corpus stats / "
    "contamination scoring. Two hash aggregations plus a join of pair "
    "counts to context totals (both keyed on context: AQE broadcasts "
    "the totals at small SF, and at scale the two aggregations are "
    "already co-partitioned on the join key); the ranking window "
    "partitions by context — vocabulary-cardinality groups whose size "
    "is bounded by distinct continuations, not corpus rows, so no "
    "single-task skew at 100 TB. Context totals are summed from pair "
    "counts BEFORE the support filter, so probabilities stay true "
    "conditional frequencies.",
)
def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    w = d.select(T.words_col().alias("w")).filter(F.size("w") >= 2)
    grams = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("w", i), F.element_at("w", i + 1)
                ),
            )
        ).alias("g")
    )
    p = grams.select(
        F.substring_index("g", " ", 1).alias("context"),
        F.substring_index("g", " ", -1).alias("next_token"),
    )
    pc = p.groupBy("context", "next_token").agg(
        F.count(F.lit(1)).alias("pair_n")
    )
    cc = pc.groupBy("context").agg(F.sum("pair_n").alias("ctx_n"))
    rw = Window.partitionBy("context").orderBy(
        F.desc("pair_n"), F.asc("next_token")
    )
    return (
        pc.join(cc, "context")
        .filter(F.col("pair_n") >= _LM_MIN_COUNT)
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= _LM_TOP_K)
        .select(
            "context",
            "next_token",
            "pair_n",
            "ctx_n",
            F.round(F.col("pair_n").cast("double") / F.col("ctx_n"), 6).alias(
                "prob"
            ),
            "rnk",
        )
        .orderBy("context", "rnk")
    )


# --- per-document bigram-LM perplexity (CCNet-style quality filter) --------

_PPL_K = 0.5  # add-k smoothing mass


def _ppl_cte() -> str:
    """CTE chain computing per-doc ``ppl (doc_id, lang, n_bigrams,
    cross_entropy, perplexity)`` — shared by the doc_perplexity and
    perplexity_tiers oracles."""
    return f"""w AS (
            SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w
            FROM documents
        ), v AS (
            SELECT COUNT(DISTINCT tok) AS vsz
            FROM (SELECT UNNEST(w) AS tok FROM w)
        ), b AS (
            SELECT doc_id, lang,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)),
                          i -> w[i] || ' ' || w[i + 1])) AS g
            FROM w WHERE LEN(w) >= 2
        ), p AS (
            SELECT doc_id, lang,
                   SPLIT_PART(g, ' ', 1) AS context,
                   SPLIT_PART(g, ' ', 2) AS next_token
            FROM b
        ), pc AS (
            SELECT context, next_token, COUNT(*) AS pair_n
            FROM p GROUP BY context, next_token
        ), cc AS (
            SELECT context, SUM(pair_n) AS ctx_n FROM pc GROUP BY context
        ), scored AS (
            SELECT p.doc_id, p.lang,
                   LN((COALESCE(pc.pair_n, 0) + {_PPL_K})
                      / (COALESCE(cc.ctx_n, 0) + {_PPL_K} * v.vsz)) AS lp
            FROM p
            LEFT JOIN pc USING (context, next_token)
            LEFT JOIN cc USING (context)
            CROSS JOIN v
        ), ppl AS (
            SELECT doc_id, lang,
                   COUNT(*) AS n_bigrams,
                   ROUND(-AVG(lp), 6) AS cross_entropy,
                   ROUND(EXP(ROUND(-AVG(lp), 6)), 4) AS perplexity
            FROM scored
            GROUP BY doc_id, lang
        )"""


@register(
    "doc_perplexity",
    oracle=f"""
        WITH {_ppl_cte()}
        SELECT doc_id, lang, n_bigrams, cross_entropy, perplexity
        FROM ppl ORDER BY doc_id
    """,
    tags=("text", "lm", "quality"),
    doc="Per-document perplexity under the corpus-trained add-k bigram "
    "LM — the CCNet-style quality filter every LM-data pipeline runs "
    "(low-perplexity = fluent/boilerplate, high = noise): "
    f"P(next|ctx) = (pair_n + {_PPL_K}) / (ctx_n + {_PPL_K}·V), "
    "cross-entropy = -mean ln P over the doc's bigrams, perplexity = "
    "exp(H) computed from the 6dp-ROUNDED entropy on BOTH engines "
    "(round-before-compare — the per-doc log-prob sum is "
    "order-sensitive float arithmetic). Scale shape: the model tables "
    "are vocabulary-bounded (pair counts ≤ V², context totals ≤ V), "
    "so AQE broadcasts them to the doc-bigram probe join at any "
    "corpus size where the vocab is capped; with an open vocab the "
    "probe and the counts are co-partitioned on the same context key. "
    "One corpus scan trains, one scan scores — no per-doc iteration.",
)
def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_ppl(spark, sf_dir).orderBy("doc_id")


def _doc_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    w = d.select("doc_id", "lang", T.words_col().alias("w"))
    v = w.select(F.explode("w").alias("tok")).agg(
        F.countDistinct("tok").alias("vsz")
    )
    b = w.filter(F.size("w") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("w", i), F.element_at("w", i + 1)
                ),
            )
        ).alias("g"),
    )
    p = b.select(
        "doc_id",
        "lang",
        F.substring_index("g", " ", 1).alias("context"),
        F.substring_index("g", " ", -1).alias("next_token"),
    )
    pc = p.groupBy("context", "next_token").agg(
        F.count(F.lit(1)).alias("pair_n")
    )
    cc = pc.groupBy("context").agg(F.sum("pair_n").alias("ctx_n"))
    scored = (
        p.join(pc, ["context", "next_token"], "left")
        .join(cc, ["context"], "left")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "lp",
            F.log(
                (F.coalesce("pair_n", F.lit(0)) + F.lit(_PPL_K))
                / (
                    F.coalesce("ctx_n", F.lit(0))
                    + F.lit(_PPL_K) * F.col("vsz")
                )
            ),
        )
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg("lp"), 6).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.round(F.exp("cross_entropy"), 4))
    )


@register(
    "perplexity_tiers",
    oracle=f"""
        WITH {_ppl_cte()}, tiered AS (
            SELECT doc_id, lang, perplexity,
                   NTILE(3) OVER (PARTITION BY lang
                                  ORDER BY perplexity, doc_id) AS t
            FROM ppl
        )
        SELECT doc_id, lang, perplexity,
               CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                      ELSE 'tail' END AS tier
        FROM tiered ORDER BY doc_id
    """,
    tags=("text", "lm", "quality"),
    doc="CCNet-style quality tiers: per-language NTILE(3) over the "
    "bigram-LM perplexity (doc_id tie-break for determinism) labels "
    "each document head / middle / tail — the bucketing CCNet uses to "
    "pick training data (head = most fluent third). Composes "
    "doc_perplexity; the window partitions by lang, so the sort is "
    "per-language, not global — at 100 TB each language sorts "
    "independently (and a quantile-sketch cut would replace the exact "
    "NTILE, trading exactness for a fixed-depth plan; the exact form "
    "is kept here because the oracle must agree row-for-row).",
)
def perplexity_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ppl = _doc_ppl(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("perplexity", "doc_id")
    t = F.ntile(3).over(w)
    return ppl.select(
        "doc_id",
        "lang",
        "perplexity",
        F.when(t == 1, "head")
        .when(t == 2, "middle")
        .otherwise("tail")
        .alias("tier"),
    ).orderBy("doc_id")


# --- distributed BPE merge training ---------------------------------------

_BPE_MERGES = 8
_EOW = "</w>"


def _bpe_oracle() -> str:
    """Unrolled-CTE DuckDB twin of the iterative BPE trainer (the same
    generated-stage pattern as the kmeans oracle): each merge step is
    one (pair-count, argmax, replace) stage triple."""
    stages = [
        f"""w0 AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
                   ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, LEN(word) + 1),
                       i -> SUBSTRING(word, i, 1)), ' ') || ' {_EOW}' AS s
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word
                  FROM documents WHERE LEN(text) > 0)
            WHERE LEN(word) > 0
            GROUP BY word
        )"""
    ]
    for i in range(_BPE_MERGES):
        stages.append(
            f"""p{i} AS MATERIALIZED (
                SELECT pr, SUM(cnt) AS n FROM (
                    SELECT cnt,
                           UNNEST(LIST_TRANSFORM(RANGE(1, LEN(a)),
                               j -> a[j] || ' ' || a[j + 1])) AS pr
                    FROM (SELECT cnt, STRING_SPLIT(s, ' ') AS a FROM w{i})
                ) GROUP BY pr
            )"""
        )
        stages.append(
            f"m{i} AS MATERIALIZED "
            f"(SELECT pr, n FROM p{i} ORDER BY n DESC, pr LIMIT 1)"
        )
        stages.append(
            f"""w{i + 1} AS MATERIALIZED (
                SELECT word, cnt,
                       TRIM(REPLACE(' ' || s || ' ',
                            ' ' || (SELECT pr FROM m{i}) || ' ',
                            ' ' || REPLACE((SELECT pr FROM m{i}), ' ', '')
                                || ' ')) AS s
                FROM w{i}
            )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, pr AS pair, REPLACE(pr, ' ', '') AS merged, "
        f"CAST(n AS BIGINT) AS pair_count FROM m{i}"
        for i in range(_BPE_MERGES)
    )
    return f"WITH {', '.join(stages)} {selects} ORDER BY step"


def _bpe_stages() -> str:
    """The shared CTE stage list (w0..w{N}, p*, m*) as a string, for
    oracles that consume the trained state (bpe_encode)."""
    oracle = _bpe_oracle()
    return oracle[len("WITH ") : oracle.index(" SELECT 0 AS step")]


def _train_bpe(spark: SparkSession, sf_dir: str):
    """Run the merge-training loop; returns (final word-symbol table,
    merge list [(step, pair, merged, count)])."""
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    word = F.col("word")
    chars = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substring(word, i, 1),
        ),
        " ",
    )
    w = (
        d.select(F.explode(T.words_col()).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word", "cnt", F.concat(chars, F.lit(f" {_EOW}")).alias("s")
        )
        # LAZY checkpoints throughout the loop: the plan is truncated
        # immediately (constant-size re-planned tree, same as before)
        # but materialization rides the round's own pair-count job
        # instead of paying a separate eager job per round — halves
        # the loop's job count; the count job computes every partition
        # (TakeOrderedAndProject over the full aggregate), so each
        # round's state is fully pinned exactly as with eager=True
        .localCheckpoint(eager=False)
    )
    merges = []
    for step in range(_BPE_MERGES):
        a = F.split("s", " ")
        prs = F.when(
            F.size(a) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(a) - 1),
                lambda j: F.concat_ws(
                    " ", F.element_at(a, j), F.element_at(a, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pair_counts = (
            w.select(F.col("cnt"), F.explode(prs).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pair_counts.orderBy(F.desc("n"), F.asc("pr")).first()
        if best is None:
            # every word collapsed to a single symbol — no pairs left.
            # The unrolled oracle degrades the same way: an empty m{i}
            # contributes no merge row and NULL-poisons later stages,
            # so both sides stop emitting merges at the same round.
            break
        merges.append((step, best["pr"], best["pr"].replace(" ", ""), int(best["n"])))
        w = w.withColumn(
            "s",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    F.lit(f" {best['pr']} "),
                    F.lit(" " + best["pr"].replace(" ", "") + " "),
                )
            ),
        ).localCheckpoint(eager=False)
    return w, merges


@register(
    "bpe_merges",
    oracle=_bpe_oracle(),
    tags=("text", "lm", "iterative"),
    doc=f"Distributed BPE merge training ({_BPE_MERGES} merges): the "
    "tokenizer-training core of an LM-data pipeline. Start from "
    "per-word character sequences weighted by corpus word counts, "
    "repeat (count adjacent symbol pairs -> merge the most frequent, "
    "lexicographic tie-break). Scale shape: each round is one "
    "explode+hash-aggregate over the DISTINCT-word table (vocabulary-"
    "sized, not corpus-sized — the classic BPE trick), the winning "
    "pair is the only row the driver sees (loop control, like "
    "dedup_components' convergence count), and the merge applies as a "
    "pure string expression. Merge application is SINGLE-PASS "
    "left-to-right non-overlapping REPLACE on both engines — for a "
    "run of the same pair >= 4 symbols ('x x x x') one pass yields "
    "'xx x x' where classic greedy BPE yields 'xx xx' (the consumed "
    "separator can't start the next match). Declared deviation: both "
    "engines share the semantics exactly (so the oracle hash is "
    "meaningful), and 4-runs of one pair are rare in natural text; a "
    "fixpoint re-application per round would restore classic greedy "
    "at the cost of unbounded oracle unrolling. The oracle unrolls "
    "the training loop into generated CTE stages like the kmeans "
    "oracle; localCheckpoint per round keeps the re-planned tree "
    "constant-size.",
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, merges = _train_bpe(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, pair string, merged string, pair_count long"
    ).orderBy("step")


def _bpe_encode_oracle() -> str:
    n = _BPE_MERGES
    return f"""
        WITH {_bpe_stages()},
        doc_words AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word,
                   LENGTH(text) AS n_chars
            FROM documents WHERE LEN(text) > 0
        ),
        vocab AS (
            SELECT word, LEN(STRING_SPLIT(s, ' ')) AS n_sym FROM w{n}
        )
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS ws_tokens,
               CAST(SUM(v.n_sym) AS BIGINT) AS bpe_tokens,
               ROUND(CAST(MAX(d.n_chars) AS DOUBLE) / SUM(v.n_sym), 4)
                   AS chars_per_token
        FROM doc_words d JOIN vocab v ON d.word = v.word
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """


@register(
    "bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text", "lm", "iterative"),
    doc="BPE ENCODING with the merges bpe_merges just trained — closes "
    "the tokenizer loop (train -> encode -> budget): every document's "
    "token count under the learned vocabulary, via one join of the "
    "corpus word stream against the trained word->symbol table (the "
    "trained state IS the encoder for in-vocabulary words — no "
    "per-document merge replay), plus chars-per-token as the "
    "compression metric an LM-data pipeline tracks per source. Scale "
    "shape: the vocab side is tiny and broadcasts; the corpus side is "
    "one explode + one aggregation keyed by doc_id. The oracle reuses "
    "the trainer's unrolled CTE stages and encodes the same way, so a "
    "hash match proves trainer AND encoder agree end-to-end across "
    "engines.",
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    w, _ = _train_bpe(spark, sf_dir)
    vocab = w.select(
        "word", F.size(F.split("s", " ")).alias("n_sym")
    )
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    doc_words = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(T.words_col()).alias("word"),
    )
    return (
        doc_words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("n_sym").alias("bpe_tokens"),
            F.round(
                F.max("n_chars").cast("double") / F.sum("n_sym"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )
