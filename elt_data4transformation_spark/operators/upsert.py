"""Upsert / merge semantics without a mutable store.

The reference leans on three idioms that all become append-only +
deterministic reconciliation transforms here (SURVEY §2.1 S6-S12):

- ``latest_wins``: ReplacingMergeTree/argMax read-side dedup — THE
  canonical convention every reference read path assumes
  (elt/loader_clickhouse.py:253-282; sql/select_topic_dataset_catalog
  .sql:9-18; streamlit 4_Topic_Terms.py:98-123).
- ``delete_insert_upsert``: ALTER TABLE ... DELETE WHERE id IN (new)
  then INSERT (elt/loader_clickhouse.py:530-573) — anti-join + union.
- ``merge_policy_upsert``: INSERT ... ON CONFLICT DO UPDATE with
  per-column rules — arrays union-merged, review fields sticky
  (COALESCE(old, new)), recency fields COALESCE(new, old)
  (study_scraper/storage/postgres.py:325-390, 1160-1239) — full outer
  join + per-column expressions.

All are shuffle-on-key transforms: at scale the key join co-locates
via hash partitioning, and the latest-wins window is a single
partial-agg-free exchange on the entity key.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame, keys: list[str], version_cols: list[str]
) -> DataFrame:
    """Keep exactly one row per key: the one with the greatest
    (version_cols...) tuple. Deterministic if the tuple is unique per
    key — include a unique id as the last element."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in version_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def delete_insert_upsert(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Replace every key present in ``new``: old rows for incoming keys
    are dropped (anti-join), then the new batch is appended."""
    return old.join(new.select(*keys).distinct(), keys, "left_anti").unionByName(
        new
    )


def merge_policy_upsert(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    array_union_cols: tuple[str, ...] = (),
    sticky_cols: tuple[str, ...] = (),
    fresh_cols: tuple[str, ...] = (),
    status_col: str | None = None,
    sticky_status: tuple[str, ...] = ("rejected",),
) -> DataFrame:
    """Full-outer-join reconciliation with the reference's merge rules
    (postgres.py:345-378):

    - ``array_union_cols``: array_distinct(array_union(old, new))
      treating NULL as empty.
    - ``sticky_cols``: COALESCE(old, new) — first write wins (review
      fields, first-seen metadata).
    - ``fresh_cols``: COALESCE(new, old) — latest write wins.
    - ``status_col``: state machine — once a row reaches a sticky
      status (e.g. 'rejected') it stays there; otherwise new status.
    Columns not named keep COALESCE(new, old).
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in old.columns if c not in keys],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in new.columns if c not in keys],
    )
    joined = o.join(n, keys, "full_outer")

    def rule(c: str) -> Column:
        oc, nc = F.col(f"_o_{c}"), F.col(f"_n_{c}")
        if c in array_union_cols:
            empty = F.array().cast("array<string>")
            return F.array_distinct(
                F.array_union(F.coalesce(oc, empty), F.coalesce(nc, empty))
            )
        if c in sticky_cols:
            return F.coalesce(oc, nc)
        if c == status_col:
            expr = F.coalesce(nc, oc)
            for s in sticky_status:
                expr = F.when(oc == s, oc).otherwise(expr)
            return expr
        # default + fresh_cols: newest non-null value
        return F.coalesce(nc, oc)

    value_cols = [c for c in old.columns if c not in keys]
    return joined.select(
        *[F.col(k) for k in keys],
        *[rule(c).alias(c) for c in value_cols],
    )


def content_hash_col(cols: Mapping[str, Column] | list[str]) -> Column:
    """sha256 of a canonical '|'-joined rendering of the given columns —
    the reference's idempotency key (study_scraper/ingest.py:12-14,
    sources/dawum.py:130-133)."""
    items = (
        [F.col(c).cast("string") for c in cols]
        if isinstance(cols, list)
        else [v.cast("string") for v in cols.values()]
    )
    return F.sha2(F.concat_ws("|", *items), 256)
