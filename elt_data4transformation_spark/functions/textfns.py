"""Text-analysis column builders.

Each helper has a Spark (Column) and a DuckDB (SQL-string) twin built
from the same constants, so oracle queries stay in lock-step with the
Spark plans. All helpers are pure built-in expressions (JVM-side,
whole-stage-codegen friendly) — no Python UDFs in the hot path.

Reference analogs: token vectors study_scraper/clustering.py:128-166,
quality/plausibility heuristics study_scraper/pipeline.py:36-64,
fingerprints study_scraper/ingest.py:12-14.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists (public common words). Deterministic
# language-ID heuristic: count stopword hits per language, argmax with a
# fixed precedence order on ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "with", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "mit", "ein", "nicht", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "avec", "un", "une", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "con", "un", "una", "para", "por"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1", "men5", "bu4"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")  # tie-break precedence


def words_col(text: str = "text") -> Column:
    return F.split(F.col(text), " ")


def words_sql(text: str = "text") -> str:
    return f"STRING_SPLIT({text}, ' ')"


def stopword_hits_col(lang: str, text: str = "text") -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(words_col(text), lambda w: w.isin(*sw))).cast("long")


def stopword_hits_sql(lang: str, text: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"LEN(LIST_FILTER({words_sql(text)}, w -> LIST_CONTAINS([{lst}], w)))"
    )


def char_shingles_col(n: int, text: str = "text") -> Column:
    """Distinct character n-gram shingles (1-based substring positions)."""
    t = F.col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def char_shingles_sql(n: int, text: str = "text") -> str:
    return (
        f"LIST_DISTINCT(LIST_TRANSFORM("
        f"RANGE(1, GREATEST(LENGTH({text}) - {n - 1}, 1) + 1), "
        f"i -> SUBSTRING({text}, i, {n})))"
    )


def word_ngrams_col(n: int, words: Column) -> Column:
    """Distinct word n-grams (space-joined) over a pre-split word array."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        )
    )


def word_ngrams_sql(n: int, wcol: str = "w") -> str:
    """DuckDB twin; ``wcol`` must be a projected list column (1-based)."""
    parts = " || ' ' || ".join(f"{wcol}[i + {j}]" for j in range(n))
    return (
        f"LIST_DISTINCT(LIST_TRANSFORM("
        f"RANGE(1, GREATEST(LEN({wcol}) - {n - 1}, 1) + 1), "
        f"i -> {parts}))"
    )


def pg_trgm_col(text: Column) -> Column:
    """pg_trgm-compatible trigram set: lowercase, per word pad with two
    leading and one trailing space, distinct 3-grams over all words
    (PostgreSQL pg_trgm semantics — the reference's similarity() at
    migrations/0006_title_dedup.sql:51-72 operates on these sets)."""
    words = F.filter(
        F.split(F.lower(text), " "), lambda w: F.length(w) > 0
    )
    padded = F.transform(
        words, lambda w: F.concat(F.lit("  "), w, F.lit(" "))
    )
    grams = F.flatten(
        F.transform(
            padded,
            lambda p: F.transform(
                F.sequence(F.lit(1), F.length(p) - 2),
                lambda i: F.substring(p, i, 3),
            ),
        )
    )
    return F.array_distinct(grams)


def pg_trgm_sql(text: str) -> str:
    return (
        f"LIST_DISTINCT(FLATTEN(LIST_TRANSFORM("
        f"LIST_TRANSFORM("
        f"LIST_FILTER(STRING_SPLIT(LOWER({text}), ' '), w -> LENGTH(w) > 0), "
        f"w -> '  ' || w || ' '), "
        f"p -> LIST_TRANSFORM(RANGE(1, LENGTH(p) - 1), "
        f"i -> SUBSTRING(p, i, 3)))))"
    )


# --- MinHash family -------------------------------------------------------
# Hash function i over a shingle s is an 8-hex-char (32-bit) slice of
# MD5(salt_g || s), where salt_g distinguishes groups of 4 slices: i in
# 0..3 slice MD5(s), i in 4..7 slice MD5('x|' || s). The "min" is the
# lexicographic minimum of the slices. Engine-portable (md5 is identical
# everywhere), deterministic, and 2 md5 evaluations per shingle instead
# of one per hash function.

_MH_SALTS = ("", "x|")


def _mh_salt_slice(i: int) -> tuple[str, int]:
    return _MH_SALTS[i // 4], (i % 4) * 8 + 1


def minhash_col(shingles: Column, i: int) -> Column:
    salt, start = _mh_salt_slice(i)

    def h(s: Column) -> Column:
        digest = F.md5(F.concat(F.lit(salt), s)) if salt else F.md5(s)
        return F.substring(digest, start, 8)

    return F.array_min(F.transform(shingles, h))


def minhash_sql(shingles_sql: str, i: int) -> str:
    salt, start = _mh_salt_slice(i)
    digest = f"MD5('{salt}' || s)" if salt else "MD5(s)"
    return (
        f"LIST_MIN(LIST_TRANSFORM({shingles_sql}, "
        f"s -> SUBSTRING({digest}, {start}, 8)))"
    )


# --- SimHash (32-bit, md5-derived) ---------------------------------------
# For each distinct word w: take the first 8 hex chars of MD5(w); hex digit
# d contributes 4 bits. Bit_b(doc) = sign(sum over words of (2*bit_b(w)-1)).
# Emitted as a 32-char '0'/'1' string. Both twins are generated from the
# same loop, so they cannot drift.

_HEX = "0123456789abcdef"


# NOTE: single-parameter lambdas only in HOFs — transform() interprets a
# two-parameter lambda (even one with a default arg) as its
# (element, index) variant, silently binding the second name to the
# array index. Use factory-function closures for loop constants.


def _word_bits(m: Column) -> Column:
    """32-element ±1 vote array from an 8-hex-char md5 prefix column."""
    votes = []
    for pos in range(8):
        v = F.conv(F.substring(m, pos + 1, 1), 16, 10).cast("int")
        for b in range(3, -1, -1):  # high bit first
            votes.append((F.floor(v / (2**b)).cast("int") % 2) * 2 - 1)
    return F.array(*votes)


def simhash_col(words: Column) -> Column:
    """Single-pass variant: md5 computed once per distinct word, 32 bit
    votes accumulated with one zip_with fold (identical output to the
    per-bit definition in simhash_sql)."""
    prefixes = F.transform(
        F.array_distinct(words), lambda w: F.substring(F.md5(w), 1, 8)
    )
    wordvecs = F.transform(prefixes, _word_bits)
    totals = F.aggregate(
        wordvecs,
        F.array_repeat(F.lit(0), 32),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    bits = F.transform(
        totals, lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.array_join(bits, "")


def simhash_sql(words_sql_expr: str) -> str:
    uw = f"LIST_DISTINCT({words_sql_expr})"
    bits = []
    for pos in range(8):
        dval = (
            f"LIST_TRANSFORM({uw}, w -> "
            f"STRPOS('{_HEX}', SUBSTRING(MD5(w), {pos + 1}, 1)) - 1)"
        )
        for b in range(3, -1, -1):
            contrib = (
                f"LIST_TRANSFORM({dval}, "
                f"v -> (CAST(FLOOR(v / {2**b}) AS INTEGER) % 2) * 2 - 1)"
            )
            total = f"LIST_SUM({contrib})"
            bits.append(f"CASE WHEN {total} > 0 THEN '1' ELSE '0' END")
    return "CONCAT(" + ", ".join(bits) + ")"


# --- shared quality / language-ID formulas (single source of truth for
# --- quality_score / lang_id AND the corpus_clean_pipeline composite) ----


def quality_col(text: str = "text") -> Column:
    """Length / stopword-ratio / punctuation-ratio blend in [0, 1].

    NULLIF guard on the char count: an empty-text row would make the
    punctuation ratio 0/0 — NaN in Spark, and NaN sorts ABOVE every
    real number in a descending rank, silently winning any
    quality-ordered election (cluster_canonical). The guard turns it
    into NULL, which LEAST skips identically on both engines, so an
    empty doc gets the same small finite quality everywhere
    (quality_sql mirrors)."""
    n_words = F.size(words_col(text)).cast("long")
    sw_ratio = stopword_hits_col("en", text).cast("double") / n_words
    punct = (
        F.size(F.regexp_extract_all(text, F.lit("[^a-z0-9 ]"), 0))
        .cast("double")
        / F.nullif(F.length(text), F.lit(0))
    )
    return F.least(
        F.greatest(
            0.3 * F.least(n_words / 200.0, F.lit(1.0))
            + 0.4 * F.least(sw_ratio * 5, F.lit(1.0))
            + 0.3 * (1.0 - F.least(punct * 10, F.lit(1.0))),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )


def quality_sql(text: str = "text") -> str:
    n_words = f"LEN({words_sql(text)})"
    sw = stopword_hits_sql("en", text)
    punct = f"LEN(REGEXP_EXTRACT_ALL({text}, '[^a-z0-9 ]'))"
    return f"""LEAST(GREATEST(
        0.3 * LEAST({n_words} / 200.0, 1.0)
      + 0.4 * LEAST(CAST({sw} AS DOUBLE) / {n_words} * 5, 1.0)
      + 0.3 * (1.0 - LEAST(CAST({punct} AS DOUBLE)
                / NULLIF(LENGTH({text}), 0) * 10, 1.0)),
        0.0), 1.0)"""


def langid_col(text: str = "text") -> Column:
    """Predicted language: stopword-hit argmax, LANG_ORDER tie-break.

    Single array_max over (score, -order, lang) structs — lexicographic
    struct comparison gives the same (max score, earliest LANG_ORDER)
    pick as a greatest+CASE chain, but each per-language stopword scan
    is evaluated exactly once instead of once in greatest and again in
    every CASE arm."""
    arm = F.array_max(
        F.array(
            *[
                F.struct(
                    stopword_hits_col(lang, text).alias("s"),
                    F.lit(-i).alias("p"),
                    F.lit(lang).alias("l"),
                )
                for i, lang in enumerate(LANG_ORDER)
            ]
        )
    )
    return F.when(arm["s"] > 0, arm["l"]).otherwise(F.lit("und"))


def langid_sql(text: str = "text") -> str:
    scores = {lang: stopword_hits_sql(lang, text) for lang in LANG_ORDER}
    best = "GREATEST(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"CASE WHEN {best} = 0 THEN 'und' ELSE (CASE {whens} END) END"
