"""Training-corpus preparation operators beyond the reference surface:
PII redaction, Gopher-style repetition gates, URL/domain blocklist
filtering, fixed-capacity sequence packing, and source-mixture
resampling. These are the ops a large-scale LLM-data pipeline runs
between raw ingest and tokenization; each is a pure codegen'd
projection/aggregate (linear, no UDFs, no collect) with a DuckDB twin.

The synthetic documents table has no contact info or links, so the
PII/URL queries derive a deterministic enriched text column from
doc_id arithmetic (the same construction on both engines — the pattern
snapshot_fuzzy_diff established); the extraction/redaction logic that
runs on it is the real operator under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import textfns as T
from ..sources import spread, table
from .registry import register

# --- PII redaction ---------------------------------------------------------

# Same regexes on both engines (Java util.regex and RE2 agree on this
# subset: character classes, bounded repeats, \b word boundaries).
_RE_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_RE_PHONE = r"\+[0-9]{2} [0-9]{2} [0-9]{7}"
_RE_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _pii_fixture_sql() -> str:
    return """
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' kontakt user' || doc_id || '@example'
                            || (doc_id % 7) || '.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN ' tel +49 30 ' || (1000000 + doc_id % 899999)
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' host ' || (doc_id % 223 + 1) || '.'
                            || (doc_id % 256) || '.' || (doc_id * 7 % 256)
                            || '.' || (doc_id * 13 % 256)
                       ELSE '' END AS text
        FROM documents
    """


def _pii_fixture_col() -> F.Column:
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" kontakt user"),
            did.cast("string"),
            F.lit("@example"),
            (did % 7).cast("string"),
            F.lit(".com"),
        ),
    ).otherwise("")
    phone = F.when(
        did % 4 == 0,
        F.concat(
            F.lit(" tel +49 30 "), (F.lit(1000000) + did % 899999).cast("string")
        ),
    ).otherwise("")
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" host "),
            (did % 223 + 1).cast("string"),
            F.lit("."),
            (did % 256).cast("string"),
            F.lit("."),
            (did * 7 % 256).cast("string"),
            F.lit("."),
            (did * 13 % 256).cast("string"),
        ),
    ).otherwise("")
    return F.concat(F.col("text"), email, phone, ip)


@register(
    "pii_redact",
    oracle=f"""
        WITH enriched AS ({_pii_fixture_sql()}),
        scanned AS (
            SELECT doc_id, source, text,
                   LEN(REGEXP_EXTRACT_ALL(text, '{_RE_EMAIL}')) AS n_email,
                   LEN(REGEXP_EXTRACT_ALL(text, '{_RE_PHONE}')) AS n_phone,
                   LEN(REGEXP_EXTRACT_ALL(text, '{_RE_IPV4}')) AS n_ip,
                   REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                       text, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                       '{_RE_PHONE}', '[PHONE]', 'g'),
                       '{_RE_IPV4}', '[IP]', 'g') AS redacted
            FROM enriched
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
               CAST(SUM(n_email) AS BIGINT) AS emails_found,
               CAST(SUM(n_phone) AS BIGINT) AS phones_found,
               CAST(SUM(n_ip) AS BIGINT)    AS ips_found,
               CAST(SUM(LEN(text) - LEN(redacted)) AS BIGINT)
                   AS chars_removed
        FROM scanned
        GROUP BY source
        ORDER BY source
    """,
    tags=("corpus", "text"),
    doc="PII detection + redaction (email / E.164-style phone / IPv4) "
    "over the document corpus: regexp_extract_all counts per class, "
    "nested regexp_replace masking, per-source audit rollup. The "
    "chars_removed column proves the masking ran (not just the "
    "counting). Pure codegen string expressions — linear scan, one "
    "shuffle for the per-source aggregate; the redacted text itself "
    "would be the written output at scale (aggregated here to keep the "
    "result hashable).",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    enriched = d.select("doc_id", "source", _pii_fixture_col().alias("text"))
    n_email = F.size(F.regexp_extract_all("text", F.lit(_RE_EMAIL), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all("text", F.lit(_RE_PHONE), F.lit(0)))
    n_ip = F.size(F.regexp_extract_all("text", F.lit(_RE_IPV4), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _RE_EMAIL, "[EMAIL]"),
            _RE_PHONE,
            "[PHONE]",
        ),
        _RE_IPV4,
        "[IP]",
    )
    scanned = enriched.select(
        "source",
        "text",
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ip.alias("n_ip"),
        redacted.alias("redacted"),
    )
    has_pii = (F.col("n_email") + F.col("n_phone") + F.col("n_ip")) > 0
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(has_pii, 1).otherwise(0)).alias("n_docs_with_pii"),
            F.sum("n_email").alias("emails_found"),
            F.sum("n_phone").alias("phones_found"),
            F.sum("n_ip").alias("ips_found"),
            F.sum(F.length("text") - F.length("redacted")).alias(
                "chars_removed"
            ),
        )
        .orderBy("source")
    )


# --- Gopher-style repetition / quality gates -------------------------------

_REP_TOP_WORD_MAX = 0.10  # most-frequent word > 10% of doc -> repetitive
_REP_DUP_2GRAM_MAX = 0.60  # duplicate-bigram fraction gate


@register(
    "repetition_score",
    oracle=f"""
        WITH w AS (
            -- >= 2 words: a 1-word doc has no bigram, and the engines
            -- disagree on the out-of-range element (concat_ws skips
            -- Spark's NULL, DuckDB's || propagates it)
            SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w
            FROM documents
            WHERE LEN(STRING_SPLIT(text, ' ')) >= 2
        ), g AS (
            SELECT doc_id, lang, w, LEN(w) AS n_words,
                   LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - 1, 1) + 1),
                                  i -> w[i] || ' ' || w[i + 1]) AS g2
            FROM w
        ), m AS (
            SELECT doc_id, lang, n_words,
                   CAST(LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(w),
                        t -> LEN(LIST_FILTER(w, x -> x = t)))) AS DOUBLE)
                       / n_words AS top_word_frac,
                   1.0 - CAST(LEN(LIST_DISTINCT(g2)) AS DOUBLE) / LEN(g2)
                       AS dup_2gram_frac,
                   LIST_SUM(LIST_TRANSFORM(w, x -> CAST(LEN(x) AS DOUBLE)))
                       / LEN(w) AS mean_word_len
            FROM g
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN top_word_frac <= {_REP_TOP_WORD_MAX}
                              AND dup_2gram_frac <= {_REP_DUP_2GRAM_MAX}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               ROUND(AVG(top_word_frac), 6)  AS avg_top_word_frac,
               ROUND(AVG(dup_2gram_frac), 6) AS avg_dup_2gram_frac,
               ROUND(AVG(mean_word_len), 6)  AS avg_word_len
        FROM m
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("corpus", "text", "quality"),
    doc="Gopher-style repetition gates (most-frequent-word fraction, "
    "duplicate-bigram fraction, mean word length) with a keep decision "
    "per document, rolled up per language. Word-level stats run as "
    "array higher-order functions over the split column — per-row "
    "compute is O(distinct_words * words), no shuffle until the final "
    "per-language aggregate. The thresholds mirror the published "
    "Gopher/MassiveText repetition rules (top-2gram and dup-line "
    "fractions), adapted to the newline-free fixture corpus.",
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    words = d.select("doc_id", "lang", T.words_col().alias("w")).filter(
        F.size("w") >= 2
    )
    n_words = F.size("w")
    # bigrams over the named column (not the raw split expr — see the
    # O(words^2) inlining note in plans/dedup.py)
    g2 = F.transform(
        F.sequence(F.lit(1), F.greatest(n_words - 1, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
        ),
    )
    top_word_frac = (
        F.array_max(
            F.transform(
                F.array_distinct("w"),
                lambda t: F.size(F.filter(F.col("w"), lambda x: x == t)),
            )
        ).cast("double")
        / n_words
    )
    dup_2gram_frac = 1.0 - F.size(F.array_distinct(g2)).cast("double") / F.size(
        g2
    )
    mean_word_len = (
        F.aggregate(
            F.transform(F.col("w"), lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n_words
    )
    m = words.select(
        "lang",
        top_word_frac.alias("top_word_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        mean_word_len.alias("mean_word_len"),
    )
    keep = (F.col("top_word_frac") <= _REP_TOP_WORD_MAX) & (
        F.col("dup_2gram_frac") <= _REP_DUP_2GRAM_MAX
    )
    return (
        m.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.round(F.avg("top_word_frac"), 6).alias("avg_top_word_frac"),
            F.round(F.avg("dup_2gram_frac"), 6).alias("avg_dup_2gram_frac"),
            F.round(F.avg("mean_word_len"), 6).alias("avg_word_len"),
        )
        .orderBy("lang")
    )


# --- URL / domain blocklist filter -----------------------------------------

_BLOCKED_DOMAINS = ("site2.com", "site5.org", "site7.net", "site11.net")


def _url_fixture_sql() -> str:
    return """
        SELECT doc_id, source,
               'https://' ||
               CASE WHEN doc_id % 6 = 0 THEN 'www.' ELSE '' END ||
               'site' || (doc_id % 13) ||
               CASE WHEN doc_id % 3 = 0 THEN '.com'
                    WHEN doc_id % 3 = 1 THEN '.org'
                    ELSE '.net' END ||
               '/doc/' || doc_id AS url
        FROM documents
    """


@register(
    "url_domain_filter",
    oracle=f"""
        WITH links AS ({_url_fixture_sql()}),
        parsed AS (
            SELECT doc_id, source,
                   REGEXP_REPLACE(
                       LOWER(REGEXP_EXTRACT(url, 'https?://([^/]+)', 1)),
                       '^www\\.', '') AS domain
            FROM links
        ),
        flagged AS (
            SELECT p.*, CASE WHEN b.domain IS NOT NULL THEN 1 ELSE 0 END
                   AS blocked
            FROM parsed p
            LEFT JOIN (SELECT UNNEST({list(_BLOCKED_DOMAINS)}) AS domain) b
              ON p.domain = b.domain
        )
        SELECT domain,
               CAST(MAX(blocked) AS INT) AS blocked,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN blocked = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept
        FROM flagged
        GROUP BY domain
        ORDER BY domain
    """,
    tags=("corpus", "join"),
    doc="URL -> normalized domain (scheme strip, lowercase, www. strip "
    "via the same regex on both engines) -> broadcast blocklist join -> "
    "per-domain keep/block audit. At 100 TB the blocklist is the "
    "canonical small-dim broadcast (thousands of rows vs billions of "
    "docs); the anti-join form `WHERE blocked = 0` is the production "
    "filter, the per-domain rollup here keeps the audit hashable.",
)
def url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(did % 6 == 0, "www.").otherwise(""),
        F.lit("site"),
        (did % 13).cast("string"),
        F.when(did % 3 == 0, ".com").when(did % 3 == 1, ".org").otherwise(
            ".net"
        ),
        F.lit("/doc/"),
        did.cast("string"),
    )
    parsed = d.select(
        "doc_id",
        "source",
        F.regexp_replace(
            F.lower(F.regexp_extract(url, r"https?://([^/]+)", 1)),
            r"^www\.",
            "",
        ).alias("domain"),
    )
    blocklist = spark.createDataFrame(
        [(b,) for b in _BLOCKED_DOMAINS], "domain string"
    ).withColumn("blocked_flag", F.lit(1))
    flagged = parsed.join(F.broadcast(blocklist), "domain", "left").select(
        "domain",
        F.coalesce("blocked_flag", F.lit(0)).alias("blocked"),
    )
    return (
        flagged.groupBy("domain")
        .agg(
            F.max("blocked").cast("int").alias("blocked"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("blocked") == 0, 1).otherwise(0)).alias(
                "n_kept"
            ),
        )
        .orderBy("domain")
    )


# --- Fixed-capacity sequence packing ---------------------------------------

_PACK_CAPACITY = 2048


@register(
    "pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
            FROM documents
        ), cum AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before
            FROM toks
        ), binned AS (
            SELECT source, n_tokens,
                   -- FLOOR, not CAST: DuckDB casts double->bigint by
                   -- rounding where Spark truncates
                   CAST(FLOOR(cum_before / {_PACK_CAPACITY}.0) AS BIGINT)
                       AS bin_id,
                   doc_id
            FROM cum
        )
        SELECT source, bin_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
               ROUND(CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_CAPACITY}, 6)
                   AS fill_ratio
        FROM binned
        GROUP BY source, bin_id
        ORDER BY source, bin_id
    """,
    tags=("corpus", "window"),
    doc="Sequence packing for training-batch assembly: concatenate "
    "documents in doc_id order within each source shard and cut "
    f"{_PACK_CAPACITY}-token bins at running-total boundaries (the "
    "contiguous-greedy packing used when locality matters more than "
    "perfect fill). One window cumsum partitioned by source + one "
    "aggregate; at scale the partition key is the shard, so no global "
    "sort or single-partition window exists anywhere in the plan.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", "source", F.size(T.words_col()).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    binned = cum.select(
        "source",
        "n_tokens",
        "doc_id",
        F.floor(F.col("cum_before") / _PACK_CAPACITY).cast("bigint").alias(
            "bin_id"
        ),
    )
    return (
        binned.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.round(
                F.sum("n_tokens").cast("double") / _PACK_CAPACITY, 6
            ).alias("fill_ratio"),
        )
        .orderBy("source", "bin_id")
    )


# --- Source-mixture resampling ---------------------------------------------

# target sampling rate per source group (domain-weighting a pretraining
# mixture): high-trust sources kept whole, the long tail downsampled
_MIX_RATES = ((0, 1.0), (1, 0.5), (2, 0.25))  # source_num % 3 -> rate


@register(
    "mixture_resample",
    oracle="""
        WITH rated AS (
            SELECT doc_id, source,
                   CASE CAST(REGEXP_EXTRACT(source, '([0-9]+)$', 1) AS INT) % 3
                        WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END AS rate,
                   CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|mix'),
                        1, 4)) AS INT) AS h
            FROM documents
        )
        SELECT source, rate,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN h < rate * 65536 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sampled
        FROM rated
        GROUP BY source, rate
        ORDER BY source
    """,
    tags=("corpus", "sampling"),
    doc="Deterministic source-mixture resampling: per-source target "
    "rate (domain weighting), membership decided by the first 16 bits "
    "of md5(doc_id || salt) — the same salted-hash split technique as "
    "dataset_split, so the sample is stable across runs, engines, and "
    "partitionings (no rand()). Pure projection + one aggregate; the "
    "production form emits the kept rows, the rollup here audits "
    "realized vs target rate per source.",
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    src_num = F.regexp_extract("source", r"([0-9]+)$", 1).cast("int")
    rate = (
        F.when(src_num % 3 == 0, 1.0)
        .when(src_num % 3 == 1, 0.5)
        .otherwise(0.25)
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))), 1, 4),
        16,
        10,
    ).cast("int")
    rated = d.select(
        "doc_id", "source", rate.alias("rate"), h.alias("h")
    )
    return (
        rated.groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("h") < F.col("rate") * 65536, 1).otherwise(0)
            ).alias("n_sampled"),
        )
        .orderBy("source")
    )


# --- Paragraph / boilerplate chunk dedup -----------------------------------

_CHUNK_WORDS = 40


@register(
    "paragraph_dedup",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, STRING_SPLIT(text, ' ') AS w
            FROM documents WHERE LEN(text) > 0
        ), chunked AS (
            SELECT doc_id, source,
                   UNNEST(LIST_TRANSFORM(
                       RANGE(0, CAST(CEIL(LEN(w) / {_CHUNK_WORDS}.0) AS INT)),
                       i -> ARRAY_TO_STRING(
                           w[(i * {_CHUNK_WORDS} + 1):(i * {_CHUNK_WORDS}
                              + {_CHUNK_WORDS})], ' '))) AS chunk
            FROM w
        ), hashed AS (
            SELECT doc_id, source, MD5(chunk) AS h,
                   LEN(STRING_SPLIT(chunk, ' ')) AS n_tokens
            FROM chunked WHERE chunk <> ''
        ), grp AS (
            SELECT h, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS keeper
            FROM hashed GROUP BY h
        ), marked AS (
            SELECT x.source, x.n_tokens,
                   CASE WHEN g.nd > 1 AND x.doc_id <> g.keeper
                        THEN 1 ELSE 0 END AS removed
            FROM hashed x JOIN grp g USING (h)
        )
        SELECT source,
               COUNT(*) AS n_chunks,
               CAST(SUM(removed) AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN removed = 1 THEN n_tokens ELSE 0 END)
                    AS BIGINT) AS tokens_removed,
               ROUND(CAST(SUM(removed) AS DOUBLE) / COUNT(*), 6)
                   AS removed_frac
        FROM marked
        GROUP BY source
        ORDER BY source
    """,
    tags=("corpus", "dedup"),
    doc=f"Paragraph-level boilerplate dedup (RefinedWeb/C4 style): slice "
    f"each document into consecutive {_CHUNK_WORDS}-word chunks, md5 "
    "each chunk, and drop every instance of a chunk that appears in "
    "more than one document except the one in the smallest doc_id "
    "(keep-first). Catches shared headers/footers/templates that "
    "document-level near-dup misses. One explode + two hash aggregates "
    "keyed on the chunk hash — the same single-shuffle shape as "
    "dedup_exact, linear at any corpus size.",
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    words = d.select("doc_id", "source", T.words_col().alias("w"))
    n_chunks = F.ceil(F.size("w") / float(_CHUNK_WORDS)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("w"), i * _CHUNK_WORDS + 1, _CHUNK_WORDS)
        ),
    )
    hashed = (
        words.select("doc_id", "source", F.explode(chunks).alias("chunk"))
        .filter(F.col("chunk") != "")
        .select(
            "doc_id",
            "source",
            F.md5("chunk").alias("h"),
            F.size(F.split("chunk", " ")).cast("long").alias("n_tokens"),
        )
    )
    grp = hashed.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd"),
        F.min("doc_id").alias("keeper"),
    )
    marked = hashed.join(grp, "h").select(
        "source",
        "n_tokens",
        F.when(
            (F.col("nd") > 1) & (F.col("doc_id") != F.col("keeper")), 1
        )
        .otherwise(0)
        .alias("removed"),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("removed").alias("n_removed"),
            F.sum(
                F.when(F.col("removed") == 1, F.col("n_tokens")).otherwise(0)
            ).alias("tokens_removed"),
            F.round(
                F.sum("removed").cast("double") / F.count(F.lit(1)), 6
            ).alias("removed_frac"),
        )
        .orderBy("source")
    )


# --- Vocabulary build (tf / df / idf) --------------------------------------

_VOCAB_TOP = 100


@register(
    "vocab_build",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents WHERE LEN(text) > 0
        ), stats AS (
            SELECT token,
                   COUNT(*) AS tf,
                   COUNT(DISTINCT doc_id) AS df
            FROM tok WHERE token <> '' GROUP BY token
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE LEN(text) > 0)
        SELECT token, tf, df,
               ROUND(LN((n.n_docs + 1.0) / (df + 1.0)), 6) AS idf,
               ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rank
        FROM stats, n
        ORDER BY rank
        LIMIT {_VOCAB_TOP}
    """,
    tags=("corpus", "text", "aggregate"),
    doc=f"Corpus vocabulary build: token -> term frequency, document "
    "frequency, smoothed idf = ln((N+1)/(df+1)), top "
    f"{_VOCAB_TOP} by tf with a deterministic (tf DESC, token) "
    "tiebreak. The table BM25/TF-IDF retrieval and df-capped "
    "inverted-index dedup both start from. One explode + one hash "
    "aggregate keyed on the token (map-side partial agg collapses "
    "per-partition repeats), then a fixed-k TakeOrdered — no global "
    "sort of the full vocabulary.",
)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    n_docs = d.count()  # scalar dimension (one job, not per-row)
    tok = d.select(
        "doc_id", F.explode(T.words_col()).alias("token")
    ).filter(F.col("token") != "")
    stats = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    from ..operators.dedup_ops import topk_per_group

    # two-phase top-k: the vocabulary is unbounded at corpus scale, so
    # local top-N per partition first, exact rank on the tiny residue
    # (never a single-task sort of the full token table)
    return (
        topk_per_group(
            stats.select(
                "token",
                "tf",
                "df",
                F.round(
                    F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
                ).alias("idf"),
            ),
            [],
            [F.desc("tf"), F.asc("token")],
            _VOCAB_TOP,
            rank_name="rank",
        )
        .orderBy("rank")
    )


# --- Deterministic stratified sampling -------------------------------------

_STRAT_K = 25


@register(
    "stratified_sample",
    oracle=f"""
        WITH ranked AS (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY MD5(CAST(doc_id AS VARCHAR) || '|strat'),
                                doc_id) AS rk
            FROM documents
        )
        SELECT lang, doc_id, rk
        FROM ranked WHERE rk <= {_STRAT_K}
        ORDER BY lang, rk
    """,
    tags=("corpus", "sampling", "window"),
    doc=f"Stratified sampling with an EXACT per-stratum quota: rank "
    "documents inside each language by md5(doc_id || salt) (a "
    f"deterministic shuffle order) and keep the first {_STRAT_K}. "
    "Unlike rate-based sampling (mixture_resample / audit_sample) the "
    "quota is met exactly per stratum — the eval-set construction "
    "primitive. Scale note: the per-stratum window shuffles on the "
    "stratum key; with few huge strata, pre-filter map-side by keeping "
    "each partition's local top-k (k is small) before the window — "
    "result-identical, bounds the shuffle to k rows per partition per "
    "stratum.",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|strat")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRAT_K)
        .orderBy("lang", "rk")
    )


# --- Approximate sketches (the 100 TB counting story) ----------------------
# No SQL oracle: DuckDB's approx algorithms differ by construction, so
# these register rows-only with accuracy bounds asserted in unit tests
# against the exact operators instead.

_HLL_RSD = 0.02  # ~2% relative standard deviation


@register(
    "hll_distinct_sketch",
    oracle=None,
    tags=("corpus", "sketch", "aggregate"),
    doc="HyperLogLog distinct counting: per-source approx_count_distinct "
    f"(rsd={_HLL_RSD}) of document fingerprints next to the exact "
    "count and the realized relative error. At 100 TB the exact "
    "count-distinct shuffles every distinct key once; the HLL sketch "
    "is fixed-size per group, mergeable across partitions (one "
    "map-side sketch per partition, merged in the reduce), and the "
    "error is set by rsd, not data size. Tests assert the realized "
    "error stays within 3*rsd; rows-only driver check by design — no "
    "SQL engine reproduces another's HLL bit-for-bit.",
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    keyed = d.select("source", F.md5("text").alias("digest"))
    return (
        keyed.groupBy("source")
        .agg(
            F.count_distinct("digest").alias("exact_distinct"),
            F.approx_count_distinct("digest", _HLL_RSD).alias(
                "approx_distinct"
            ),
        )
        .select(
            "source",
            "exact_distinct",
            "approx_distinct",
            F.round(
                F.abs(
                    F.col("approx_distinct").cast("double")
                    - F.col("exact_distinct")
                )
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


_QSKETCH_ACC = 10000  # approx_percentile accuracy knob


@register(
    "quantile_sketch",
    oracle=None,
    tags=("corpus", "sketch", "aggregate"),
    doc="Mergeable quantile sketch: per-language approx_percentile "
    "(Greenwald-Khanna variant, accuracy "
    f"{_QSKETCH_ACC}) of document token counts next to the exact "
    "percentile_approx=exact at this accuracy? No — tests assert "
    "each sketched quantile lands within rank-error 1/accuracy of the "
    "exact percentile. The exact form sorts every group member; the "
    "sketch is bounded-size and mergeable, which is what survives a "
    "100 TB groupBy. Rows-only driver check by design.",
)
def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    toks = d.select("lang", F.size(T.words_col()).cast("double").alias("n"))
    return (
        toks.groupBy("lang")
        .agg(
            F.approx_percentile(
                "n", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), _QSKETCH_ACC
            ).alias("q"),
            F.expr("percentile(n, array(0.5, 0.9, 0.99))").alias("q_exact"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "lang",
            "n_docs",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p90"),
            F.col("q")[2].alias("p99"),
            F.round(F.col("q_exact")[0], 4).alias("p50_exact"),
            F.round(F.col("q_exact")[1], 4).alias("p90_exact"),
            F.round(F.col("q_exact")[2], 4).alias("p99_exact"),
        )
        .orderBy("lang")
    )


# --- Token co-occurrence PMI -----------------------------------------------

_PMI_VOCAB = 150  # pairs restricted to the top-V document-frequency tokens
_PMI_MIN_CO = 5  # minimum co-document count for a reported pair
_PMI_TOP = 100


@register(
    "pmi_cooccurrence",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
                FROM documents WHERE LEN(text) > 0
            ) WHERE token <> ''
        ), dfreq AS (
            SELECT token, COUNT(*) AS df FROM tok GROUP BY token
        ), vocab AS (
            SELECT token, df FROM dfreq
            ORDER BY df DESC, token LIMIT {_PMI_VOCAB}
        ), n AS (
            SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok
        ), vt AS (
            SELECT t.doc_id, t.token, v.df
            FROM tok t JOIN vocab v USING (token)
        ), pairs AS (
            SELECT a.token AS token_a, b.token AS token_b,
                   a.df AS df_a, b.df AS df_b,
                   COUNT(*) AS co_docs
            FROM vt a JOIN vt b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY a.token, b.token, a.df, b.df
        )
        SELECT token_a, token_b, co_docs,
               ROUND(LN(CAST(co_docs AS DOUBLE) * n.n_docs
                        / (df_a * df_b)), 6) AS pmi,
               ROW_NUMBER() OVER (
                   ORDER BY co_docs DESC, token_a, token_b) AS rank
        FROM pairs CROSS JOIN n
        WHERE co_docs >= {_PMI_MIN_CO}
        ORDER BY rank
        LIMIT {_PMI_TOP}
    """,
    tags=("corpus", "text", "join", "aggregate"),
    doc="Pointwise mutual information over token co-occurrence — the "
    "corpus-statistics pass behind collocation mining and phrase "
    f"vocabularies. Pairs are restricted to the top-{_PMI_VOCAB} "
    "document-frequency tokens (broadcast back into the token stream), "
    "so the per-document pair fan-out is bounded by the vocabulary cap "
    "rather than document length; the pair generator is an equi-join "
    "on doc_id (inverted-index shape, same as dedup_ngram_jaccard) — "
    "never a cross join. pmi = ln(co_docs * N / (df_a * df_b)), "
    "two-phase top-k on the result.",
)
def pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_ops import topk_per_group

    d = spread(table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    tok = (
        d.select("doc_id", F.explode(T.words_col()).alias("token"))
        .filter(F.col("token") != "")
        .dropDuplicates(["doc_id", "token"])
        .persist()  # reused by df-stats, both pair-join sides, n_docs
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    vocab = topk_per_group(
        dfreq, [], [F.desc("df"), F.asc("token")], _PMI_VOCAB, rank_name="_vr"
    ).drop("_vr")
    # corpus size stays a 1-row FRAME crossJoined in below (never a
    # driver-side .count() — that is a whole extra job wave for one
    # scalar the plan can carry). Dropping that count also drops the
    # eager cache warm it incidentally provided: tok's consumers may
    # now race a cold cache and re-read the dropDuplicates shuffle
    # output. Accepted trade — the shuffle is computed once either
    # way (its files are reused), a duplicate shuffle READ is bounded
    # by one pass over the token stream, and the saved scheduling
    # wave measured larger at sf0.1 (2.8 -> 2.6 s).
    nd = tok.agg(
        F.countDistinct("doc_id").cast("double").alias("_n_docs")
    )
    vt = tok.join(F.broadcast(vocab), "token")
    a = vt.select(
        "doc_id",
        F.col("token").alias("token_a"),
        F.col("df").alias("df_a"),
    )
    b = vt.select(
        "doc_id",
        F.col("token").alias("token_b"),
        F.col("df").alias("df_b"),
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("co_docs"))
        .filter(F.col("co_docs") >= _PMI_MIN_CO)
    )
    scored = pairs.crossJoin(F.broadcast(nd)).select(
        "token_a",
        "token_b",
        "co_docs",
        F.round(
            F.log(
                F.col("co_docs").cast("double")
                * F.col("_n_docs")
                / (F.col("df_a") * F.col("df_b"))
            ),
            6,
        ).alias("pmi"),
    )
    return topk_per_group(
        scored,
        [],
        [F.desc("co_docs"), F.asc("token_a"), F.asc("token_b")],
        _PMI_TOP,
        rank_name="rank",
    ).orderBy("rank")


# --- Per-document TF-IDF top terms -----------------------------------------

_TFIDF_K = 3


@register(
    "tfidf_topterms",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents WHERE LEN(text) > 0
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tok WHERE token <> '' GROUP BY doc_id, token
        ), dfreq AS (
            SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        ), n AS (
            SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
        ), scored AS (
            SELECT tf.doc_id, tf.token,
                   ROUND(tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0)),
                         6) AS tfidf
            FROM tf JOIN dfreq USING (token) CROSS JOIN n
        ), ranked AS (
            SELECT doc_id, token, tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tfidf DESC, token) AS rank
            FROM scored
        )
        SELECT doc_id, rank, token, tfidf
        FROM ranked WHERE rank <= {_TFIDF_K}
        ORDER BY doc_id, rank
    """,
    tags=("corpus", "text", "window"),
    doc=f"Per-document top-{_TFIDF_K} TF-IDF terms — the keyword/"
    "fingerprint projection a retrieval or topic pipeline derives per "
    "document. tf is one hash aggregate on (doc_id, token); df/idf "
    "reuses vocab_build's smoothed ln((N+1)/(df+1)); the per-document "
    "rank window partitions on doc_id — a high-cardinality key, so "
    "unlike a per-language window it parallelizes at any corpus size. "
    "The df join is a plain shuffle join on token (the vocabulary can "
    "be billions of distinct tokens at 100 TB — deliberately NOT "
    "broadcast; AQE downgrades it to broadcast when small).",
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    tf = (
        d.select("doc_id", F.explode(T.words_col()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()  # reused by df-stats, n_docs and the scoring join
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # 1-row frame, not a driver .count() — see pmi_cooccurrence
    nd = tf.agg(F.countDistinct("doc_id").alias("_n_docs"))
    scored = tf.join(dfreq, "token").crossJoin(F.broadcast(nd)).select(
        "doc_id",
        "token",
        F.round(
            F.col("tf")
            * F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TFIDF_K)
        .select("doc_id", "rank", "token", "tfidf")
        .orderBy("doc_id", "rank")
    )


# --- RAG / training chunking ----------------------------------------------

_CHUNK_SIZE = 64  # words per chunk
_CHUNK_STRIDE = 48  # step between chunk starts (overlap = 16 words)


@register(
    "chunk_documents",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
                   LEN(STRING_SPLIT(text, ' ')) AS n
            FROM documents WHERE LEN(text) > 0
        ), starts AS (
            SELECT doc_id, n, UNNEST(RANGE(1, n + 1, {_CHUNK_STRIDE}))
                       AS start_word,
                   w
            FROM w
        )
        SELECT doc_id,
               CAST((start_word - 1) / {_CHUNK_STRIDE} AS BIGINT)
                   AS chunk_idx,
               CAST(start_word AS BIGINT) AS start_word,
               CAST(LEAST({_CHUNK_SIZE}, n - start_word + 1) AS BIGINT)
                   AS n_tokens,
               MD5(ARRAY_TO_STRING(
                   w[start_word : start_word + {_CHUNK_SIZE} - 1], ' '))
                   AS chunk_hash
        FROM starts
        ORDER BY doc_id, chunk_idx
    """,
    tags=("corpus", "chunk"),
    doc="Overlapping sliding-window chunking — the RAG/embedding-prep "
    f"shape: {_CHUNK_SIZE}-word chunks every {_CHUNK_STRIDE} words "
    "(16-word overlap so no boundary sentence is lost), each chunk "
    "addressed by (doc_id, chunk_idx) and content-hashed for "
    "downstream chunk-level dedup (paragraph_dedup's unit) / "
    "incremental re-embedding (only changed hashes re-embed). Pure "
    "per-row generator expression -> explode: linear, partition-local, "
    "no shuffle before the output sort; both engines slice the same "
    "1-based word array so the hashes agree exactly.",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    w = d.select(
        "doc_id",
        T.words_col().alias("w"),
        F.size(T.words_col()).alias("n"),
    )
    starts = w.select(
        "doc_id",
        "n",
        "w",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(_CHUNK_STRIDE))
        ).alias("start_word"),
    )
    return (
        starts.select(
            "doc_id",
            ((F.col("start_word") - 1) / _CHUNK_STRIDE)
            .cast("long")
            .alias("chunk_idx"),
            F.col("start_word").cast("long").alias("start_word"),
            F.least(
                F.lit(_CHUNK_SIZE), F.col("n") - F.col("start_word") + 1
            )
            .cast("long")
            .alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice(F.col("w"), F.col("start_word"), _CHUNK_SIZE),
                    " ",
                )
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# --- token-distribution entropy (quality signal) ---------------------------


@register(
    "token_entropy",
    oracle="""
        WITH t AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
            FROM documents WHERE LEN(text) > 0
        ), c AS (
            SELECT doc_id, tok, COUNT(*) AS cnt
            FROM t GROUP BY doc_id, tok
        ), c2 AS (
            SELECT doc_id, cnt,
                   SUM(cnt) OVER (PARTITION BY doc_id) AS tot
            FROM c
        ), d AS (
            SELECT doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   -SUM((CAST(cnt AS DOUBLE) / tot)
                        * LOG2(CAST(cnt AS DOUBLE) / tot)) AS h
            FROM c2 GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_distinct,
               ROUND(h, 4) AS entropy,
               ROUND(h / NULLIF(LOG2(CAST(n_distinct AS DOUBLE)), 0.0), 4)
                   AS norm_entropy
        FROM d
        ORDER BY doc_id
    """,
    tags=("corpus", "text"),
    doc="Per-document token-distribution Shannon entropy + normalized "
    "entropy (H / log2 distinct) — the information-density quality "
    "signal complementing repetition_score's top-word fraction: "
    "boilerplate and keyword-stuffed documents score low, natural prose "
    "high. One explode + (doc,token) aggregation, a doc-keyed window "
    "for the totals, and the final doc aggregation — the last two "
    "reuse the window's doc_id exchange; linear in corpus "
    "size; entropy rounded to 4dp on both engines so summation order "
    "cannot flip the hash. NULLIF guards the single-distinct-token "
    "degenerate doc (0/0) identically on both engines.",
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    c = (
        d.select("doc_id", F.explode(T.words_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the per-doc total comes from a window over the already-aggregated
    # (doc, token) counts — same doc_id key as the groupBy below, so
    # the window sort and the final aggregation share one exchange
    tot = F.sum("cnt").over(Window.partitionBy("doc_id"))
    c2 = c.withColumn("p", F.col("cnt") / tot)
    agg = c2.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        (-F.sum(F.col("p") * F.log2("p"))).alias("h"),
    )
    return (
        agg.select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round("h", 4).alias("entropy"),
            F.round(
                F.col("h")
                / F.nullif(
                    F.log2(F.col("n_distinct").cast("double")), F.lit(0.0)
                ),
                4,
            ).alias("norm_entropy"),
        )
        .orderBy("doc_id")
    )


# --- per-source lexical drift (KL divergence vs the corpus) ----------------

_KL_V = 200  # vocabulary size (top tokens by corpus tf, token tiebreak)


@register(
    "source_kl_divergence",
    oracle=f"""
        WITH tok AS (
            SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents WHERE LEN(text) > 0
        ), t2 AS (
            SELECT source, token FROM tok WHERE token <> ''
        ), vocab AS (
            SELECT token, COUNT(*) AS tf FROM t2 GROUP BY token
            ORDER BY tf DESC, token LIMIT {_KL_V}
        ), cs AS (
            SELECT t.source, t.token, COUNT(*) AS c
            FROM t2 t JOIN vocab v ON t.token = v.token
            GROUP BY t.source, t.token
        ), srcs AS (
            SELECT DISTINCT source FROM documents WHERE LEN(text) > 0
        ), dense AS (
            SELECT s.source, v.token, v.tf, COALESCE(c.c, 0) AS c
            FROM srcs s CROSS JOIN vocab v
            LEFT JOIN cs c ON c.source = s.source AND c.token = v.token
        ), ns AS (
            SELECT source, SUM(c) AS n_s FROM dense GROUP BY source
        ), tot AS (
            SELECT SUM(tf) AS n FROM vocab
        )
        SELECT d.source, CAST(ns.n_s AS BIGINT) AS n_tokens,
               ROUND(SUM(
                   ((d.c + 1.0) / (ns.n_s + {_KL_V}.0))
                   * LN(((d.c + 1.0) / (ns.n_s + {_KL_V}.0))
                        / ((d.tf + 1.0) / (tot.n + {_KL_V}.0)))
               ), 6) AS kl_nats
        FROM dense d
        JOIN ns ON d.source = ns.source
        CROSS JOIN tot
        GROUP BY d.source, ns.n_s
        ORDER BY d.source
    """,
    tags=("corpus", "audit"),
    doc="Per-source lexical drift: KL divergence of each source's "
    f"unigram distribution from the whole corpus, over the top-{_KL_V} "
    "vocabulary (tf DESC, token tiebreak — deterministic cut), add-one "
    "smoothed so zero counts stay finite. The domain-shift audit that "
    "complements source_overlap_matrix: overlap finds the same BYTES "
    "crawled twice, KL finds a source whose LANGUAGE drifted (a crawl "
    "gone off-domain, a source turned boilerplate) before it skews the "
    "training mixture — the CCNet/C4-style corpus monitoring metric. "
    "Scale: one explode + two hash aggregates keyed on the token; the "
    f"densified (source x {_KL_V}) grid is a broadcast cross join of "
    "two tiny frames, never row-proportional; the KL sum is "
    "6dp-rounded on both engines (repo float rule — term magnitudes "
    "~1e-2, summation-order noise ~1e-16).",
)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_ops import topk_per_group

    V = _KL_V
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    tok = d.select("source", F.explode(T.words_col()).alias("token")).filter(
        F.col("token") != ""
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = topk_per_group(
        tf, [], [F.desc("tf"), F.asc("token")], V
    ).select("token", "tf")
    cs = (
        tok.join(F.broadcast(vocab.select("token")), "token", "left_semi")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    srcs = d.select("source").distinct()
    dense = (
        srcs.crossJoin(F.broadcast(vocab))
        .join(cs, ["source", "token"], "left")
        .fillna(0, subset=["c"])
    )
    ns = dense.groupBy("source").agg(F.sum("c").alias("n_s"))
    tot = vocab.agg(F.sum("tf").alias("n"))
    p = (F.col("c") + F.lit(1.0)) / (F.col("n_s") + F.lit(float(V)))
    q = (F.col("tf") + F.lit(1.0)) / (F.col("n") + F.lit(float(V)))
    return (
        dense.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_nats"))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            "kl_nats",
        )
        .orderBy("source")
    )


# --- heavy hitters (Misra-Gries candidates + exact recount) ----------------

_HH_K = 200  # report tokens with global count > n / _HH_K


@register(
    "heavy_hitters",
    oracle=f"""
        WITH tok AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents WHERE LEN(text) > 0
        ), t2 AS (
            SELECT token FROM tok WHERE token <> ''
        ), n AS (
            SELECT COUNT(*) AS n FROM t2
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM t2, n
        GROUP BY token, n.n
        HAVING COUNT(*) > n.n / {_HH_K}
        ORDER BY cnt DESC, token
    """,
    tags=("corpus", "sketch"),
    doc=f"Exact heavy hitters (tokens with count > n/{_HH_K}) via a "
    "MERGEABLE sketch prefilter: phase 1 runs Misra-Gries(k) per "
    "partition inside Arrow-batched mapInPandas — bounded k-entry "
    "state per task, emitting only surviving candidate tokens. "
    "Pigeonhole + the MG guarantee prove the candidate UNION is a "
    "SUPERSET of every global heavy hitter (if count_p <= n_p/k in "
    "every partition, the global count <= n/k — contradiction), so "
    "phase 2's exact recount (semi-join on the bounded candidate "
    "set, one hash aggregate) loses nothing and restores exactness — "
    "which is why this sketch query IS oracle-checkable while "
    "hll/quantile are rows-only. The 100 TB story: the full token "
    "aggregate touches every distinct token (billions); the MG pass "
    "caps per-task state at k entries and the recount aggregates "
    "only |candidates| <= k * n_partitions tokens. Property test "
    "fuzzes the superset guarantee on skewed synthetic streams. "
    "Reference analog: A8 frequency histograms (SURVEY §2.5) made "
    "sub-linear in distinct-token space.",
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from ..operators.sketches import misra_gries_batches

    d = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    tok = d.select(F.explode(T.words_col()).alias("token")).filter(
        F.col("token") != ""
    )

    # the MG pass also measures each partition's exact stream length
    # (one sentinel row per task), so the n/k threshold needs NO
    # separate full-scan count job: two corpus scans total (sketch +
    # recount), down from three
    def mg(batches):
        yield from misra_gries_batches(
            batches, "token", _HH_K, total_col="_np"
        )

    sketch = tok.mapInPandas(mg, "token string, _np long").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sketch.count()  # eager: candidates + total both read the tiny cache
    cand = (
        sketch.filter(F.col("token").isNotNull())
        .select("token")
        .distinct()
    )
    total = sketch.agg(F.sum("_np").alias("_n"))
    counts = (
        tok.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("_n") / F.lit(_HH_K))
        .select("token", "cnt")
        .orderBy(F.desc("cnt"), "token")
    )
