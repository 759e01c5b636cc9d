"""Deduplication operators over `documents` / `embeddings`:
exact hash, MinHash+LSH, word-n-gram Jaccard, SimHash, embedding-cosine
near-dup (training-data pipeline surface; reference analogs: T4 DOI
dedup storage/postgres.py:228-270, T5 trigram title dedup
migrations/0006_title_dedup.sql:51-72, T6 read-time finding dedup
study_scraper/findings.py:99-137).

Scale design: every pairwise comparison is bucketed first (LSH bands,
language blocks) so candidate generation is an equi-join, never a full
cross join; the exact re-score runs only on candidates. At 100 TB the
band join shuffles on band keys, which are uniformly distributed by
construction (md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import textfns as T
from ..sources import table
from .registry import register

N_MINHASH = 8
N_BANDS = 2  # 4 hashes per band
SHINGLE = 5


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", T.char_shingles_col(SHINGLE).alias("shingles"))


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingled(spark, sf_dir)
    sig = sh.select(
        "doc_id",
        "shingles",
        *[
            T.minhash_col(F.col("shingles"), i).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ],
    )
    per_band = N_MINHASH // N_BANDS
    for b in range(N_BANDS):
        cols = [F.col(f"mh{i}") for i in range(b * per_band, (b + 1) * per_band)]
        sig = sig.withColumn(f"band{b}", F.md5(F.concat(*cols)))
    return sig


def _signatures_sql() -> tuple[str, str]:
    """(sh CTE, sig CTE) DuckDB twins of _shingled/_signatures."""
    sh = (
        f"SELECT doc_id, lang, {T.char_shingles_sql(SHINGLE)} AS shingles "
        f"FROM documents"
    )
    mh = [T.minhash_sql("shingles", i) for i in range(N_MINHASH)]
    per_band = N_MINHASH // N_BANDS
    bands = ", ".join(
        "MD5("
        + " || ".join(mh[i] for i in range(b * per_band, (b + 1) * per_band))
        + f") AS band{b}"
        for b in range(N_BANDS)
    )
    mh_cols = ", ".join(f"{m} AS mh{i}" for i, m in enumerate(mh))
    sig = f"SELECT doc_id, shingles, {mh_cols}, {bands} FROM sh"
    return sh, sig


@register(
    "dedup_exact",
    oracle="""
        SELECT MD5(text) AS content_hash,
               MIN(doc_id) AS canonical_doc_id,
               COUNT(*) AS dup_count
        FROM documents
        GROUP BY content_hash
        ORDER BY canonical_doc_id
    """,
    tags=("dedup",),
    doc="Exact dedup: hash-groupBy, min-id canonical — reference analog "
    "T4 DOI dedup-merge (first row wins) storage/postgres.py:228-270. "
    "Scales as a single hash aggregation on the digest key.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .orderBy("canonical_doc_id")
    )


def _minhash_sig_oracle() -> str:
    sh, sig = _signatures_sql()
    mh_names = ", ".join(f"mh{i}" for i in range(N_MINHASH))
    band_names = ", ".join(f"band{b}" for b in range(N_BANDS))
    return f"""
        WITH sh AS ({sh}), sig AS ({sig})
        SELECT doc_id, {mh_names}, {band_names}
        FROM sig ORDER BY doc_id
    """


@register(
    "minhash_signatures",
    oracle=_minhash_sig_oracle(),
    tags=("dedup", "hash"),
    doc=f"MinHash signatures: {SHINGLE}-char shingles → {N_MINHASH} "
    "portable min-wise hashes (lexicographic min of MD5(i||'|'||s)) → "
    f"{N_BANDS} LSH band keys. The signature stage of T5-style dedup at "
    "scale (reference: pg_trgm trigram index, migrations/0006:28-29).",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _signatures(spark, sf_dir)
    return sig.select(
        "doc_id",
        *[f"mh{i}" for i in range(N_MINHASH)],
        *[f"band{b}" for b in range(N_BANDS)],
    ).orderBy("doc_id")


def _minhash_pairs_oracle() -> str:
    sh, sig = _signatures_sql()
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
        WITH sh AS ({sh}), sig AS ({sig}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               ROUND(CAST(LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) AS DOUBLE)
                     / LEN(LIST_DISTINCT(LIST_CONCAT(sa.shingles, sb.shingles))), 6)
                   AS jaccard
        FROM cand c
        JOIN sh sa ON c.doc_a = sa.doc_id
        JOIN sh sb ON c.doc_b = sb.doc_id
        WHERE CAST(LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) AS DOUBLE)
              / LEN(LIST_DISTINCT(LIST_CONCAT(sa.shingles, sb.shingles))) >= 0.5
        ORDER BY doc_a, doc_b
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_pairs_oracle(),
    tags=("dedup",),
    doc="MinHash+LSH near-dup pairs: band-key equi-join generates "
    "candidates, exact shingle-Jaccard >= 0.5 re-score keeps precision — "
    "the scale path for T5 trigram dedup (migrations/0006_title_dedup.sql:"
    "51-72: similarity >= 0.85 best-match). Candidate generation never "
    "cross-joins; see tests for synthetic near-dup coverage.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _signatures(spark, sf_dir)
    bands = None
    for b in range(N_BANDS):
        part = sig.select(
            "doc_id", F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_key")
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = _shingled(spark, sf_dir)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_distinct(F.concat("sa", "sb"))
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= 0.5)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, lang, {T.word_ngrams_sql(3, 'w')} AS grams
            FROM (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w
                  FROM documents
                  WHERE LEN(STRING_SPLIT(text, ' ')) >= 3)
        ), pairs AS (
            SELECT a.lang AS lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(LEN(LIST_INTERSECT(a.grams, b.grams)) AS DOUBLE)
                   / LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams))) AS jac
            FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                      ORDER BY jac DESC, doc_a, doc_b) AS rn
            FROM pairs
        )
        SELECT lang, doc_a, doc_b, ROUND(jac, 6) AS jaccard
        FROM ranked WHERE rn <= 5
        ORDER BY lang, doc_a, doc_b
    """,
    tags=("dedup",),
    doc="Word-3-gram Jaccard similarity, blocked by language (blocking key "
    "stands in for LSH buckets at this scale), top-5 most-similar pairs "
    "per block — T5/J11 trigram similarity join analog "
    "(migrations/0006_title_dedup.sql:51-72).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = T.words_col()
    g = d.filter(F.size(w) >= 3).select(
        "doc_id", "lang", T.word_ngrams_col(3, w).alias("grams")
    )
    a = g.select(
        F.col("lang"),
        F.col("doc_id").alias("doc_a"),
        F.col("grams").alias("ga"),
    )
    b = g.select(
        F.col("lang").alias("lang_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("grams").alias("gb"),
    )
    jac = F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(
        F.array_distinct(F.concat("ga", "gb"))
    )
    pairs = (
        a.join(b, (F.col("lang") == F.col("lang_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select("lang", "doc_a", "doc_b", jac.alias("jac"))
    )
    wnd = Window.partitionBy("lang").orderBy(F.desc("jac"), "doc_a", "doc_b")
    return (
        pairs.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_a", "doc_b", F.round("jac", 6).alias("jaccard"))
        .orderBy("lang", "doc_a", "doc_b")
    )


@register(
    "simhash_docs",
    oracle=f"""
        SELECT doc_id, lang,
               {T.simhash_sql("STRING_SPLIT(text, ' ')")} AS simhash32
        FROM documents
        ORDER BY doc_id
    """,
    tags=("dedup", "hash"),
    doc="SimHash (32-bit, md5-derived bit votes over distinct words), "
    "emitted as a bit string — near-dup fingerprint for hamming-distance "
    "bucketing at scale; Spark and oracle expressions are generated from "
    "the same loop (functions/textfns.py).",
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", T.simhash_col(T.words_col()).alias("simhash32"))
        .orderBy("doc_id")
    )


@register(
    "embedding_neardup",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               a.label AS label_a, b.label AS label_b,
               ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE LIST_COSINE_SIMILARITY(a.v, b.v) >= 0.45
        ORDER BY vec_a, vec_b
    """,
    tags=("dedup", "similarity"),
    doc="Embedding-cosine near-duplicate pairs (threshold 0.45 for this "
    "synthetic corpus) — brute-force within-corpus variant; the bucketed "
    "scale path is ann_ivf_topk. Cosine is computed as a JVM-side "
    "aggregate fold over array<double>, no UDF.",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"), F.col("v").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("v").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.45)
        .select(
            "vec_a", "vec_b", "label_a", "label_b",
            F.round("cos_raw", 6).alias("cosine"),
        )
        .orderBy("vec_a", "vec_b")
    )
