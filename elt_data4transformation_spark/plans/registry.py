"""Query registry: one entry per implemented operator/query.

Each spec carries the Spark plan builder ``fn(spark, sf_dir) ->
DataFrame`` and, when the semantics are ANSI-SQL-expressible, a DuckDB
``oracle`` query over the same parquet tables. The driver (and our
tests) run both and hash-compare; column names must match exactly, so
every computed column is aliased identically on both sides.

Float note: aggregate outputs are rounded (usually to 4-6 decimals) on
BOTH sides so that summation-order differences between engines cannot
flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""  # reference citation (SURVEY.md §2 operator ids)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco
