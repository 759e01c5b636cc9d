"""Spec-driven data-quality checks (the engine analog of the
reference's dbt schema tests).

Reference: dbt_project/models/models.yml:4-80 declares unique /
not_null / accepted_range / unique_combination_of_columns specs per
model; dags/dbt_transform_dag.py:264-311 runs them as generated
validation queries and aggregates pass/fail. Here the same contract is
a spec tuple compiled by operators/dq.py into one union-of-violations
report — both the Spark plan and the DuckDB oracle derive from the
SAME spec list, so the contract cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dq import DQCheck, dq_report, dq_report_sql
from ..sources import table
from .registry import register

# Primary key per table: violation samples are keys, never values, so
# float formatting can't differ between engines.
DQ_KEYS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "events": "event_id",
    "documents": "doc_id",
}

# The declared contract — mirrors the reference's models.yml check
# kinds over the driver tables. Several checks genuinely FAIL on the
# synthetic testdata (o_totalprice cap, o_custkey uniqueness, the
# lineitem composite key, the o_orderdate window) so the report
# demonstrably detects violations, not just rubber-stamps.
DQ_CHECKS = (
    DQCheck("orders", "unique", ("o_orderkey",)),
    DQCheck("orders", "unique", ("o_custkey",)),  # fails: repeat buyers
    DQCheck("orders", "not_null", ("o_custkey",)),
    DQCheck("orders", "accepted_range", ("o_totalprice",), lo=0, hi=100000),
    DQCheck(
        "orders",
        "accepted_range",
        ("o_orderdate",),
        lo="1992-01-01",
        hi="1998-12-31",
    ),
    DQCheck("lineitem", "unique_combination", ("l_orderkey", "l_linenumber")),
    DQCheck("lineitem", "accepted_range", ("l_quantity",), lo=1, hi=50),
    DQCheck("lineitem", "not_null", ("l_shipdate",)),
    DQCheck("customer", "unique", ("c_custkey",)),
    DQCheck("customer", "not_null", ("c_name",)),
    DQCheck("events", "unique", ("event_id",)),
    DQCheck("events", "not_null", ("user_id",)),
    DQCheck("documents", "unique", ("doc_id",)),
    # dbt-core's remaining two schema-test kinds:
    DQCheck(
        "orders", "accepted_values", ("o_orderstatus",), values=("F", "O", "P")
    ),
    DQCheck(
        "lineitem", "accepted_values", ("l_returnflag",), values=("A", "N", "R")
    ),
    # fails: the corpus also contains 'es' documents — proves detection
    DQCheck(
        "documents",
        "accepted_values",
        ("lang",),
        values=("en", "de", "zh", "fr"),
    ),
    DQCheck(
        "orders",
        "relationships",
        ("o_custkey",),
        to_table="customer",
        to_column="c_custkey",
    ),
    DQCheck(
        "lineitem",
        "relationships",
        ("l_orderkey",),
        to_table="orders",
        to_column="o_orderkey",
    ),
)


@register(
    "dq_runner",
    oracle=dq_report_sql(DQ_KEYS, DQ_CHECKS),
    tags=("quality", "contract"),
    doc="Declarative data-quality runner: the reference's dbt schema "
    "tests (unique, not_null, accepted_range, "
    "unique_combination_of_columns — models.yml:4-80, executed by "
    "dags/dbt_transform_dag.py:264-311) PLUS dbt-core's other two "
    "kinds (accepted_values, relationships referential-integrity) as "
    "a spec tuple compiled to ONE union-of-violations report. "
    "Row-level checks per table (incl. accepted_values) fold into a "
    "single conditional-aggregate scan (N checks, one pass); "
    "uniqueness checks are one hash aggregate per declared key; "
    "relationships are anti joins (parent broadcasts when a dim); "
    "samples are min offending PRIMARY KEYS so engine float "
    "formatting never leaks into the report. The oracle SQL is "
    "generated from the SAME spec list. Includes deliberately "
    "failing checks (o_totalprice cap, o_custkey uniqueness, the "
    "lang allow-list missing 'es') to prove detection.",
)
def dq_runner(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = {c.table for c in DQ_CHECKS} | {
        c.to_table for c in DQ_CHECKS if c.to_table
    }
    tables = {t: table(spark, sf_dir, t) for t in sorted(names)}
    return dq_report(tables, DQ_KEYS, DQ_CHECKS)
