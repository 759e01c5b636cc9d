"""Best-effort conversions (SURVEY §2.8 'Conversions' + hard-item 3):
German decimal/thousands parsing and multi-format timestamp parsing.

Both are pure column expressions (no UDFs) with DuckDB SQL twins
generated from the same format/pattern constants, so oracle parity
cannot drift.

Reference: German number heuristics study_scraper/claims.py:136-155
('62,5' -> 62.5, '6.063' -> 6063, '1.234.567,89' -> 1234567.89);
parseDateTimeBestEffort usages dbt raw_dawum_polls.sql:16-23,
create_datasets_unified_view.sql:51.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dot-groups-of-3 (German thousands), optional comma decimals
_DE_THOUSANDS_RE = r"^-?\d{1,3}(\.\d{3})+(,\d+)?$"

# (spark format, duckdb strptime format) — tried in order
TS_FORMATS: tuple[tuple[str, str], ...] = (
    ("yyyy-MM-dd'T'HH:mm:ss", "%Y-%m-%dT%H:%M:%S"),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
)


def parse_german_number_col(s: Column | str) -> Column:
    s = F.col(s) if isinstance(s, str) else s
    thousands = F.replace(
        F.replace(s, F.lit("."), F.lit("")), F.lit(","), F.lit(".")
    )
    decimal_comma = F.replace(s, F.lit(","), F.lit("."))
    # try_cast: unparseable input -> NULL under ANSI mode (matches the
    # oracle's TRY_CAST and the reference's skip-on-parse-failure)
    return (
        F.when(s.rlike(_DE_THOUSANDS_RE), thousands)
        .when(s.contains(","), decimal_comma)
        .otherwise(s)
        .try_cast("double")
    )


def parse_german_number_sql(expr: str) -> str:
    return f"""
        TRY_CAST(CASE
            WHEN REGEXP_MATCHES({expr}, '{_DE_THOUSANDS_RE}')
                THEN REPLACE(REPLACE({expr}, '.', ''), ',', '.')
            WHEN CONTAINS({expr}, ',')
                THEN REPLACE({expr}, ',', '.')
            ELSE {expr}
        END AS DOUBLE)
    """


def best_effort_timestamp_col(s: Column | str) -> Column:
    s = F.col(s) if isinstance(s, str) else s
    return F.coalesce(
        *[F.try_to_timestamp(s, F.lit(fmt)) for fmt, _ in TS_FORMATS]
    )


def best_effort_timestamp_sql(expr: str) -> str:
    tries = ", ".join(
        f"TRY_STRPTIME({expr}, '{fmt}')" for _, fmt in TS_FORMATS
    )
    return f"COALESCE({tries})"
