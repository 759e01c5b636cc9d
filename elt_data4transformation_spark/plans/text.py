"""Text-analysis queries over the `documents` table: language ID,
quality scoring, token counting, fingerprinting (the training-data
pipeline surface; reference analogs cited per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
               ROUND(CAST(n_stopwords AS DOUBLE) / n_words, 6) AS stopword_ratio,
               ROUND(CAST(n_punct AS DOUBLE) / n_chars_actual, 6) AS punct_ratio,
               ROUND(LEAST(GREATEST(
                   0.3 * LEAST(n_words / 200.0, 1.0)
                 + 0.4 * LEAST(CAST(n_stopwords AS DOUBLE) / n_words * 5, 1.0)
                 + 0.3 * (1.0 - LEAST(CAST(n_punct AS DOUBLE) / n_chars_actual * 10, 1.0)),
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
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars_actual")
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
