"""Declarative data-quality runner — the engine analog of ``dbt test``.

The reference declares spec-driven schema tests (``unique``,
``not_null``, ``accepted_range``, ``unique_combination_of_columns`` —
dbt_project/models/models.yml:4-80) and executes them as generated
validation queries (dags/dbt_transform_dag.py:264-311). Here the same
four check kinds are a DATA STRUCTURE (`DQCheck`) compiled into one
union-of-violations report DataFrame, with a DuckDB SQL generator
derived from the SAME spec list so both engines run the identical
contract.

Scale shape: all row-level checks on a table (not_null,
accepted_range) fold into ONE conditional-aggregate pass over that
table — a single scan no matter how many checks, each violation count
a map-side partial sum. Uniqueness checks are one hash aggregate per
declared key (the group-by IS the check); their violating-key residue
is tiny, so the final count/min collapse is trivial. Nothing is ever
collected: the report itself is a DataFrame.

Violation samples are the table's primary key (numeric min for
row-level checks, lexicographic min of the '|'-joined key string for
uniqueness checks) so float-formatting differences between engines
can never leak into the report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROW_CHECKS = ("not_null", "accepted_range", "accepted_values")
KEY_CHECKS = ("unique", "unique_combination")
REL_CHECKS = ("relationships",)


@dataclass(frozen=True)
class DQCheck:
    """One declared constraint — mirrors a dbt schema-test entry."""

    table: str
    check: str  # not_null | accepted_range | accepted_values |
    #             unique | unique_combination | relationships
    columns: tuple[str, ...]
    lo: object = None  # accepted_range bounds: number, or ISO date str
    hi: object = None
    values: tuple = ()  # accepted_values allow-list
    to_table: str = ""  # relationships: parent table
    to_column: str = ""  # relationships: parent key column

    def __post_init__(self) -> None:
        """Reject malformed specs at declaration time — a bad check
        must fail loudly when declared, not compile into invalid SQL
        ('COALESCE( , FALSE)') or a silently-vacuous condition."""
        kinds = ROW_CHECKS + KEY_CHECKS + REL_CHECKS
        if self.check not in kinds:
            raise ValueError(f"unknown DQ check kind: {self.check!r}")
        if not self.columns:
            raise ValueError(f"{self.check}: at least one column required")
        if self.check == "accepted_range" and self.lo is None and self.hi is None:
            raise ValueError(
                f"accepted_range on {self.table}.{self.col_label()}: "
                "at least one of lo/hi is required"
            )
        if self.check == "accepted_values" and not self.values:
            raise ValueError(
                f"accepted_values on {self.table}.{self.col_label()}: "
                "empty allow-list would flag every row"
            )
        if self.check == "relationships" and not (
            self.to_table and self.to_column
        ):
            raise ValueError(
                f"relationships on {self.table}.{self.col_label()}: "
                "to_table and to_column are required"
            )

    def col_label(self) -> str:
        return "+".join(self.columns)


def _lit_col(v) -> F.Column:
    """Range-bound literal: ISO date strings become DATE, else numeric."""
    if isinstance(v, str):
        return F.lit(v).cast("date")
    return F.lit(v)


def _lit_sql(v) -> str:
    return f"DATE '{v}'" if isinstance(v, str) else str(v)


def _val_sql(v) -> str:
    """accepted_values literal: strings quoted, numerics bare — the
    same typed comparison Spark's ``Column.isin`` performs (quoting a
    numeric allow-list would make DuckDB compare through varchar)."""
    return f"'{v}'" if isinstance(v, str) else str(v)


def _row_cond(c: DQCheck) -> F.Column:
    col = F.col(c.columns[0])
    if c.check == "not_null":
        return col.isNull()
    if c.check == "accepted_values":
        # dbt semantics: NULLs pass accepted_values (declare not_null
        # separately); NULL NOT IN (...) is NULL, coalesced to false
        return F.coalesce(~col.isin(*c.values), F.lit(False))
    # accepted_range: NULLs are not range violations (dbt semantics —
    # declare not_null separately); NULL comparisons fall out as NULL,
    # coalesced to false
    cond = F.lit(False)
    if c.lo is not None:
        cond = cond | (col < _lit_col(c.lo))
    if c.hi is not None:
        cond = cond | (col > _lit_col(c.hi))
    return F.coalesce(cond, F.lit(False))


def _row_cond_sql(c: DQCheck) -> str:
    col = c.columns[0]
    if c.check == "not_null":
        return f"{col} IS NULL"
    if c.check == "accepted_values":
        vals = ", ".join(_val_sql(v) for v in c.values)
        return f"COALESCE({col} NOT IN ({vals}), FALSE)"
    parts = []
    if c.lo is not None:
        parts.append(f"{col} < {_lit_sql(c.lo)}")
    if c.hi is not None:
        parts.append(f"{col} > {_lit_sql(c.hi)}")
    return "COALESCE(" + " OR ".join(parts) + ", FALSE)"


def dq_report(
    tables: dict[str, DataFrame],
    keys: dict[str, str],
    checks: tuple[DQCheck, ...],
) -> DataFrame:
    """Compile the spec list into one violations-report DataFrame:
    (table_name, check_name, columns, n_violations, sample, passed),
    one row per declared check, sample = min offending key (NULL when
    the check passes)."""
    if not checks:
        raise ValueError("dq_report: empty check list")
    parts: list[DataFrame] = []
    by_table: dict[str, list[DQCheck]] = {}
    for c in checks:
        if c.check in ROW_CHECKS:
            by_table.setdefault(c.table, []).append(c)

    for tname, row_checks in by_table.items():
        df, key = tables[tname], keys[tname]
        aggs = []
        for i, c in enumerate(row_checks):
            cond = _row_cond(c)
            aggs.append(
                F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"_n{i}")
            )
            aggs.append(
                F.min(F.when(cond, F.col(key))).cast("string").alias(f"_s{i}")
            )
        one = df.agg(*aggs)
        parts.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c.check).alias("check_name"),
                                F.lit(c.col_label()).alias("columns"),
                                F.col(f"_n{i}").alias("n_violations"),
                                F.col(f"_s{i}").alias("sample"),
                            )
                            for i, c in enumerate(row_checks)
                        ]
                    )
                ).alias("r")
            ).select(F.lit(tname).alias("table_name"), "r.*")
        )

    for c in checks:
        if c.check not in KEY_CHECKS:
            continue
        df = tables[c.table]
        key_str = F.concat_ws(
            "|", *[F.col(col).cast("string") for col in c.columns]
        )
        viol = (
            df.groupBy(*c.columns)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .select(key_str.alias("_k"))
        )
        parts.append(
            viol.agg(
                F.count(F.lit(1)).alias("n_violations"),
                F.min("_k").alias("sample"),
            ).select(
                F.lit(c.table).alias("table_name"),
                F.lit(c.check).alias("check_name"),
                F.lit(c.col_label()).alias("columns"),
                "n_violations",
                "sample",
            )
        )

    for c in checks:
        if c.check not in REL_CHECKS:
            continue
        child, key = tables[c.table], keys[c.table]
        parent = tables[c.to_table].select(
            F.col(c.to_column).alias(c.columns[0])
        )
        # referential integrity: child rows whose (non-NULL) FK has no
        # parent — an anti join on the key; at scale the parent side
        # broadcasts when it is a dim, else both sides co-partition
        orphans = child.filter(F.col(c.columns[0]).isNotNull()).join(
            parent, c.columns[0], "left_anti"
        )
        parts.append(
            orphans.agg(
                F.count(F.lit(1)).alias("n_violations"),
                F.min(F.col(key)).cast("string").alias("sample"),
            ).select(
                F.lit(c.table).alias("table_name"),
                F.lit(c.check).alias("check_name"),
                F.lit(f"{c.col_label()}->{c.to_table}.{c.to_column}").alias(
                    "columns"
                ),
                "n_violations",
                "sample",
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0).orderBy(
        "table_name", "check_name", "columns"
    )


def dq_report_sql(keys: dict[str, str], checks: tuple[DQCheck, ...]) -> str:
    """DuckDB twin generated from the SAME spec list."""
    selects = []
    for c in checks:
        if c.check in ROW_CHECKS:
            cond = _row_cond_sql(c)
            selects.append(
                f"""SELECT '{c.table}' AS table_name,
                '{c.check}' AS check_name,
                '{c.col_label()}' AS columns,
                CAST(COALESCE(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END), 0)
                     AS BIGINT) AS n_violations,
                CAST(MIN(CASE WHEN {cond} THEN {keys[c.table]} END)
                     AS VARCHAR) AS sample
                FROM {c.table}"""
            )
        elif c.check in REL_CHECKS:
            col = c.columns[0]
            selects.append(
                f"""SELECT '{c.table}' AS table_name,
                '{c.check}' AS check_name,
                '{c.col_label()}->{c.to_table}.{c.to_column}' AS columns,
                CAST(COUNT(*) AS BIGINT) AS n_violations,
                CAST(MIN({keys[c.table]}) AS VARCHAR) AS sample
                FROM {c.table} ch
                WHERE ch.{col} IS NOT NULL AND NOT EXISTS (
                    SELECT 1 FROM {c.to_table} pa
                    WHERE pa.{c.to_column} = ch.{col})"""
            )
        else:
            key_str = ", ".join(
                f"CAST({col} AS VARCHAR)" for col in c.columns
            )
            selects.append(
                f"""SELECT '{c.table}' AS table_name,
                '{c.check}' AS check_name,
                '{c.col_label()}' AS columns,
                CAST(COUNT(*) AS BIGINT) AS n_violations,
                MIN(_k) AS sample
                FROM (SELECT CONCAT_WS('|', {key_str}) AS _k
                      FROM {c.table} GROUP BY {", ".join(c.columns)}
                      HAVING COUNT(*) > 1)"""
            )
    union = "\nUNION ALL\n".join(selects)
    return f"""
        SELECT *, n_violations = 0 AS passed FROM ({union})
        ORDER BY table_name, check_name, columns
    """
