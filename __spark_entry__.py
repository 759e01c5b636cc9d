"""Driver contract for the spark-graft builder (PySpark target).

Backed by the query registry in ``elt_data4transformation_spark.plans``:
every implemented operator from SURVEY.md §2 registers a Spark plan
builder and (when SQL-expressible) a DuckDB oracle query with matching
column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from elt_data4transformation_spark.plans import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    answer_pipeline is the reference's own flagship read path (SURVEY
    §3.1: search → dedup → cluster → weighted aggregate) end-to-end.
    """
    return REGISTRY["answer_pipeline"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops; the driver then does a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
