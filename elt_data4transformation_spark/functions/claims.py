"""T1 claim extraction: numerical findings from (German) study text.

Reference: study_scraper/claims.py:57-76 (percent + sample regexes,
German word-form units), :109-213 (ALL-matches extraction, per-span
dedup, +-90-char word-boundary snippets, >120 suppression, stable
sha256 claim ids). Reference tests test_claims.py /
test_claims_german_pct.py encode the edge cases; tests/test_operators.py
ports them against this Spark transform.

Spark-first design: everything is built-in column expressions — no
Python UDFs. Match *positions* (which the reference gets from
``re.finditer`` and which feed the snippet windows) are recovered
declaratively: split the text by the same regex, then the i-th match
starts at ``sum(len(segs[:i+1])) + sum(len(matches[:i]))``. Both
engines compute the identical positions (verified against Python
``finditer``), so snippets — and therefore claim ids — agree exactly.

At 100 TB this is an embarrassingly parallel projection + explode; the
only shuffle is the caller's final ordering. The O(n_matches^2) prefix
sums are over per-document match counts (tiny) — not data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A number followed by a percent marker; German polling prose writes
# the unit many ways. Longest alternatives first (claims.py:57-63).
# (?i) works in both Java regex (Spark) and RE2 (DuckDB).
PCT_PATTERN = (
    r"(?i)(\d+(?:[.,]\d+)?)\s*"
    r"(%|prozentpunkte|prozentpunkt|prozent|v\.?\s?h\.?|vom\s+hundert)"
)
# "n=1024", "n = 1.024", "(n=1 024," — sample-size cues (claims.py:70-74)
SAMPLE_PATTERN = r"(?i)\bn\s*=\s*(\d+(?:[. ]\d{3})*(?:[.,]\d+)?)\b"
CONTEXT_CHARS = 90  # snippet window, claims.py:78
MAX_PCT = 120.0  # a percent level > 120 is never a poll figure (claims.py:171)

_SNIPPET_DELIMS = (" ", ".", ";", "!", "?")


# --- value parsing (claims.py:136-155 _value_to_float, exact parity) ----
# The match regex allows at most one separator for percents and
# dot/space thousands groups for n=. The reference heuristic: a single
# separator followed by exactly 3 digits is a thousands mark; multi-dot
# tokens fall through to float() and fail -> NULL (faithfully kept).

def claim_value_col(token: Column) -> Column:
    token = F.replace(token, F.lit(" "), F.lit(""))
    strip_all = F.replace(
        F.replace(token, F.lit("."), F.lit("")), F.lit(","), F.lit("")
    )
    return (
        F.when(token.rlike(r"^\d+(\.\d+)*,\d{3}$"), strip_all)
        .when(token.contains(","), F.replace(token, F.lit(","), F.lit(".")))
        .when(token.rlike(r"^\d+\.\d{3}$"), F.replace(token, F.lit("."), F.lit("")))
        .otherwise(token)
        .try_cast("double")
    )


def claim_value_sql(expr: str) -> str:
    t = f"REPLACE({expr}, ' ', '')"
    return f"""TRY_CAST(CASE
        WHEN REGEXP_MATCHES({t}, '^\\d+(\\.\\d+)*,\\d{{3}}$')
            THEN REPLACE(REPLACE({t}, '.', ''), ',', '')
        WHEN CONTAINS({t}, ',') THEN REPLACE({t}, ',', '.')
        WHEN REGEXP_MATCHES({t}, '^\\d+\\.\\d{{3}}$') THEN REPLACE({t}, '.', '')
        ELSE {t}
    END AS DOUBLE)"""


# --- unit normalization (claims.py:65-68) -------------------------------

def unit_col(unit_raw: Column) -> Column:
    low = F.replace(F.lower(unit_raw), F.lit(" "), F.lit(""))
    return F.when(low.startswith("prozentpunkt"), F.lit("pp")).otherwise(F.lit("%"))


def unit_sql(expr: str) -> str:
    return (
        f"CASE WHEN REPLACE(LOWER({expr}), ' ', '') LIKE 'prozentpunkt%' "
        f"THEN 'pp' ELSE '%' END"
    )


# --- snippet window (claims.py:121-133 _trim_snippet, exact parity) -----
# lo backs off to the space at/before start-90 (or 0); hi extends to the
# first " .;!?" at/after end+90 (or len); then trim + whitespace collapse.

def _snippet_col(text: Column, start0: Column, end0: Column) -> Column:
    length = F.length(text)
    lo0 = F.greatest(F.lit(0), start0 - CONTEXT_CHARS)
    prefix = text.substr(F.lit(1), lo0 + 1)
    rs = F.instr(F.reverse(prefix), " ")
    lo = F.when(rs > 0, lo0 + 1 - rs).otherwise(F.lit(0))
    hi0 = F.least(length, end0 + CONTEXT_CHARS)
    tail = text.substr(hi0 + 1, length)
    k = F.least(
        *[F.nullif(F.instr(tail, c), F.lit(0)) for c in _SNIPPET_DELIMS]
    )
    hi = F.when(k.isNull(), length).otherwise(hi0 + k - 1)
    return F.regexp_replace(
        F.trim(text.substr(lo + 1, hi - lo)), r"\s+", " "
    )


def _snippet_sql(text: str, start0: str, end0: str) -> str:
    lo0 = f"GREATEST(0, {start0} - {CONTEXT_CHARS})"
    rs = f"STRPOS(REVERSE(SUBSTR({text}, 1, {lo0} + 1)), ' ')"
    lo = f"(CASE WHEN {rs} > 0 THEN {lo0} + 1 - {rs} ELSE 0 END)"
    hi0 = f"LEAST(LENGTH({text}), {end0} + {CONTEXT_CHARS})"
    tail = f"SUBSTR({text}, {hi0} + 1)"
    k = "LEAST(" + ", ".join(
        f"NULLIF(STRPOS({tail}, '{c}'), 0)" for c in _SNIPPET_DELIMS
    ) + ")"
    hi = f"(CASE WHEN {k} IS NULL THEN LENGTH({text}) ELSE {hi0} + {k} - 1 END)"
    return (
        f"REGEXP_REPLACE(TRIM(SUBSTR({text}, {lo} + 1, {hi} - {lo})), "
        f"'\\s+', ' ', 'g')"
    )


# --- all-matches explode with positions ---------------------------------

def _matches_with_pos(src: DataFrame, pattern: str) -> DataFrame:
    """One row per regex match over src(study_id, text), with the match
    string and its 0-based [start, end) — finditer, declaratively."""
    ext = src.select(
        "study_id",
        "text",
        F.regexp_extract_all("text", F.lit(pattern), 0).alias("matches"),
        F.split("text", pattern, -1).alias("segs"),
    )
    # posexplode_OUTER + isnotnull, not plain posexplode: the non-outer
    # generator lets InferFiltersFromGenerate add `size(matches) > 0
    # AND isnotnull(matches)` below the Generate, and predicate
    # pushdown inlines the full regexp_extract_all into that scan
    # filter — every row then pays the regex 2-3x (seen in the
    # optimized plan). The outer form carries empty-match rows as one
    # NULL row instead, and the isnotnull on the EXPLODED column drops
    # them right after the Generate — same rows out (match strings are
    # never null), regex evaluated once per input row.
    ex = ext.select(
        "study_id",
        "text",
        "segs",
        "matches",
        F.posexplode_outer("matches").alias("pos", "m"),
    ).filter(F.col("m").isNotNull())
    start0 = F.expr(
        "aggregate(slice(segs, 1, pos + 1), 0, (a, x) -> a + length(x))"
        " + aggregate(slice(matches, 1, pos), 0, (a, x) -> a + length(x))"
    )
    return ex.select(
        "study_id",
        "text",
        "m",
        start0.alias("start0"),
        (start0 + F.length("m")).alias("end0"),
    )


def _matches_with_pos_sql(src_sql: str, pattern: str) -> str:
    pat = pattern.replace("\\", "\\\\").replace("'", "''")
    return f"""
        SELECT study_id, text, m,
               CAST(COALESCE(list_sum(list_transform(segs[1:i],
                        x -> length(x))), 0)
                  + COALESCE(list_sum(list_transform(matches[1:i-1],
                        x -> length(x))), 0) AS BIGINT) AS start0,
               CAST(COALESCE(list_sum(list_transform(segs[1:i],
                        x -> length(x))), 0)
                  + COALESCE(list_sum(list_transform(matches[1:i-1],
                        x -> length(x))), 0) + LENGTH(m) AS BIGINT) AS end0
        FROM (
            SELECT study_id, text, segs, matches,
                   UNNEST(matches) AS m,
                   UNNEST(generate_series(1, len(matches))) AS i
            FROM (
                SELECT study_id, text,
                       regexp_extract_all(text, e'{pat}', 0) AS matches,
                       str_split_regex(text, e'{pat}') AS segs
                FROM ({src_sql})
            )
        )
    """


# --- the full extractor (claims.py:158-213 _extract_from_field) ---------

def claims_from_text_df(src: DataFrame, source_field: str = "fulltext") -> DataFrame:
    """All claims from src(study_id: string-castable, text: string).

    Output: study_id, claim_id, value_num, unit ('%'|'pp'|'n'),
    snippet, source_field — one row per surviving match.
    """
    from pyspark import StorageLevel

    # both pattern branches (and the window/dedup chain above them)
    # consume the same (study_id, text) projection; persisting it keeps
    # the upstream text construction + scan from running 3-4 times —
    # measured 2.7x on the registered claims_extract at sf0.1
    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    pct = _matches_with_pos(src, PCT_PATTERN).select(
        "study_id",
        "text",
        "start0",
        "end0",
        claim_value_col(
            F.regexp_extract("m", PCT_PATTERN, 1)
        ).alias("value_num"),
        unit_col(F.regexp_extract("m", PCT_PATTERN, 2)).alias("unit"),
        F.lit(0).alias("prio"),
    ).where(F.col("value_num").isNotNull() & (F.col("value_num") <= MAX_PCT))
    # NOTE: values 1900-2100 ("year tokens") are > MAX_PCT, so the same
    # ceiling subsumes the reference's _looks_like_year filter, which is
    # vestigial once the regex requires a unit (claims.py:108-118).
    smp = _matches_with_pos(src, SAMPLE_PATTERN).select(
        "study_id",
        "text",
        "start0",
        "end0",
        claim_value_col(
            F.regexp_extract("m", SAMPLE_PATTERN, 1)
        ).alias("value_num"),
        F.lit("n").alias("unit"),
        F.lit(1).alias("prio"),
    ).where(F.col("value_num").isNotNull())
    both = pct.unionByName(smp)
    # per-span dedup: (source_field, m.start(), value) shared across the
    # two extractors within one call (claims.py:177-180, 199-202)
    from pyspark.sql import Window

    w = Window.partitionBy("study_id", "start0", "value_num").orderBy("prio")
    deduped = (
        both.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "prio")
    )
    snippet = _snippet_col(F.col("text"), F.col("start0"), F.col("end0"))
    out = deduped.select(
        F.col("study_id").cast("string").alias("study_id"),
        F.round("value_num", 4).alias("value_num"),
        "unit",
        snippet.alias("snippet"),
        F.lit(source_field).alias("source_field"),
    )
    # stable id (claims.py:92-106): unit+value are part of the identity
    return out.select(
        "study_id",
        F.sha2(
            F.concat_ws(
                "|",
                "study_id",
                "source_field",
                "snippet",
                "unit",
                F.col("value_num").cast("string"),
            ),
            256,
        ).alias("claim_id"),
        "value_num",
        "unit",
        "snippet",
        "source_field",
    )


def claims_from_text_sql(src_sql: str, source_field: str = "fulltext") -> str:
    """DuckDB twin of claims_from_text_df over the same src SQL."""
    pct_m = _matches_with_pos_sql(src_sql, PCT_PATTERN)
    smp_m = _matches_with_pos_sql(src_sql, SAMPLE_PATTERN)
    pct_val = claim_value_sql(f"REGEXP_EXTRACT(m, '{PCT_PATTERN}', 1)")
    pct_unit = unit_sql(f"REGEXP_EXTRACT(m, '{PCT_PATTERN}', 2)")
    smp_val = claim_value_sql(f"REGEXP_EXTRACT(m, '{SAMPLE_PATTERN}', 1)")
    snip = _snippet_sql("text", "start0", "end0")
    return f"""
        WITH pct_raw AS ({pct_m}),
        smp_raw AS ({smp_m}),
        both_claims AS (
            SELECT study_id, text, start0, end0,
                   {pct_val} AS value_num, {pct_unit} AS unit, 0 AS prio
            FROM pct_raw
            WHERE {pct_val} IS NOT NULL AND {pct_val} <= {MAX_PCT}
            UNION ALL
            SELECT study_id, text, start0, end0,
                   {smp_val} AS value_num, 'n' AS unit, 1 AS prio
            FROM smp_raw
            WHERE {smp_val} IS NOT NULL
        ), deduped AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY study_id, start0, value_num
                    ORDER BY prio) AS rn
                FROM both_claims
            ) WHERE rn = 1
        ), shaped AS (
            SELECT CAST(study_id AS VARCHAR) AS study_id,
                   ROUND(value_num, 4) AS value_num, unit,
                   {snip} AS snippet,
                   '{source_field}' AS source_field
            FROM deduped
        )
        SELECT study_id,
               SHA256(CONCAT_WS('|', study_id, source_field, snippet,
                                unit, CAST(value_num AS VARCHAR))) AS claim_id,
               value_num, unit, snippet, source_field
        FROM shaped
    """
