"""JSON-stat 2.0 N-dimensional cube flattening (SURVEY §2.10 M1/M2).

Reference: study_scraper/jsonstat.py:30-109 — row-major strides (last
dim fastest), dense-array or sparse-dict ``value``, label fallback to
category id, malformed category indexes skipped.

Two implementations:

- ``decode_jsonstat`` + ``flatten_jsonstat``: the pure-Python decoder
  (unit-testable, byte-faithful to the reference semantics) applied per
  payload with mapInPandas — one Arrow batch per partition, payloads
  decode independently, so this scales horizontally with payload count.
- ``flatten_jsonstat_spark``: pure-DataFrame variant for dense-array
  payloads — posexplode the value array, compute each dimension's
  coordinate with integer div/mod stride arithmetic over the ``size``
  array, resolve category ids/labels from inverted index maps, all with
  built-in higher-order functions (no Python in the hot path).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "record_id string, dims map<string,string>, value double"


def decode_jsonstat(doc: dict) -> Iterator[tuple[dict[str, str], float]]:
    """Yield (dim_name -> category_label, value) per non-null data point.

    Row-major order, last dimension fastest; ``value`` may be a dense
    list or a sparse {str(offset): value} dict; label falls back to the
    category id; category indexes that are not well-formed ints are
    skipped (reference jsonstat.py:63-71)."""
    for _offset, dims, v in _decode_points(doc):
        yield dims, v


def _mapping(node: object) -> dict:
    """The dict at ``node``, or {} when the payload put something else
    there — the 'malformed → skipped' rule applied to structure."""
    return node if isinstance(node, dict) else {}


def _decode_points(doc: dict) -> Iterator[tuple[int, dict[str, str], float]]:
    """Core decoder: yields (offset, dims, value) per surviving point.

    Quarantine contract (pinned by tests/test_properties.py fuzz
    props): ANY malformed payload shape — wrong-typed nodes,
    non-integer or non-positive sizes, id/size length mismatch,
    non-numeric values, broken index maps — yields nothing or skips
    the malformed points; it NEVER raises, because the mapInPandas
    callers trap only json.loads errors and an escaping TypeError/
    ZeroDivisionError would kill the Spark stage."""
    if not isinstance(doc, dict):
        return
    dim_ids = doc.get("id") or []
    sizes = doc.get("size") or []
    if not isinstance(dim_ids, list) or not isinstance(sizes, list):
        return
    if len(dim_ids) != len(sizes) or not dim_ids:
        return
    if not all(isinstance(s, int) and not isinstance(s, bool) and s > 0
               for s in sizes):
        return  # malformed size vector: no offset is decodable
    # per-dim position -> label lookup
    lookups: list[dict[int, str]] = []
    for d in dim_ids:
        if not isinstance(d, str):
            return
        cat = _mapping(
            _mapping(_mapping(doc.get("dimension")).get(d)).get("category")
        )
        index = cat.get("index") or {}
        labels = _mapping(cat.get("label"))
        if isinstance(index, list):  # JSON-stat allows list form
            index = {
                cid: i
                for i, cid in enumerate(index)
                if isinstance(cid, str)  # category ids are strings
            }
        if not isinstance(index, dict):
            index = {}
        lk: dict[int, str] = {}
        for cid, pos in index.items():
            if not isinstance(pos, int) or isinstance(pos, bool):
                try:
                    pos = int(pos)
                except (TypeError, ValueError):
                    continue  # malformed index entry: skip
            label = labels.get(cid, cid)
            lk[pos] = label if isinstance(label, str) else str(cid)
        lookups.append(lk)

    value = doc.get("value")
    total = math.prod(sizes)
    if isinstance(value, dict):
        items = []
        for k, v in value.items():
            try:
                items.append((int(k), v))
            except (TypeError, ValueError):
                continue
        points: Iterator[tuple[int, object]] = iter(sorted(items))
    elif isinstance(value, list):
        points = ((i, v) for i, v in enumerate(value))
    else:
        return

    for offset, v in points:
        if v is None or isinstance(v, bool) or offset < 0 or offset >= total:
            continue
        try:
            fv = float(v)
        except (TypeError, ValueError):
            continue  # non-numeric data point: skip
        dims: dict[str, str] = {}
        rem = offset
        ok = True
        for d, size, lk in zip(
            reversed(dim_ids), reversed(sizes), reversed(lookups)
        ):
            pos = rem % size
            rem //= size
            if pos not in lk:
                ok = False
                break
            dims[d] = lk[pos]
        if ok:
            yield offset, dims, fv


def flatten_jsonstat(
    df: DataFrame, payload_col: str = "payload", id_col: str = "record_id"
) -> DataFrame:
    """mapInPandas flattener: one output row per non-null data point."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    doc = json.loads(payload)
                except (TypeError, ValueError):
                    continue
                for dims, v in decode_jsonstat(doc):
                    out.append({"record_id": rid, "dims": dims, "value": v})
            yield pd.DataFrame(
                out, columns=["record_id", "dims", "value"]
            )

    return df.mapInPandas(fn, OUT_SCHEMA)


OUT_SCHEMA_STATUS = (
    "record_id string, dims map<string,string>, value double, status string"
)


def decode_jsonstat_status(
    doc: dict,
) -> Iterator[tuple[dict[str, str], float, str | None]]:
    """M2 legacy variant: also carry the per-point ``status`` flag
    ({str(offset): code} map, JSON-stat 1.x/eurostat style — reference
    connectors/eurostat_connector.py:436-541). Decode semantics are
    shared with decode_jsonstat via _decode_points."""
    status_map = doc.get("status") if isinstance(doc, dict) else {}
    if not isinstance(status_map, dict):
        status_map = {}
    for offset, dims, v in _decode_points(doc):
        st = status_map.get(str(offset))
        yield dims, v, st if isinstance(st, str) else None


def flatten_jsonstat_status(
    df: DataFrame, payload_col: str = "payload", id_col: str = "record_id"
) -> DataFrame:
    """mapInPandas flattener for the legacy status-carrying decode."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    doc = json.loads(payload)
                except (TypeError, ValueError):
                    continue
                for dims, v, st in decode_jsonstat_status(doc):
                    out.append(
                        {
                            "record_id": rid,
                            "dims": dims,
                            "value": v,
                            "status": st,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["record_id", "dims", "value", "status"]
            )

    return df.mapInPandas(fn, OUT_SCHEMA_STATUS)


def flatten_jsonstat_spark(
    df: DataFrame, payload_col: str = "payload", id_col: str = "record_id"
) -> DataFrame:
    """Pure-Spark flattener for dense-array payloads.

    Stride arithmetic: coordinate of dim k for offset p is
    (p div prod(size[k+1:])) mod size[k]; categories resolve through an
    inverted (position -> label-or-id) map per dimension. Everything is
    a built-in expression, so it runs inside codegen and scales as a
    plain projection + two explodes."""
    dim_schema = (
        "map<string, struct<category: struct<"
        "index: map<string,long>, label: map<string,string>>>>"
    )
    st = df.select(
        F.col(id_col).alias("record_id"),
        F.from_json(
            F.col(payload_col),
            "struct<id: array<string>, size: array<long>, value: array<double>, "
            f"dimension: {dim_schema}>",
        ).alias("d"),
    )
    # (record, offset, value) per non-null point
    pts = st.select(
        "record_id",
        F.col("d.id").alias("dim_ids"),
        F.col("d.size").alias("sizes"),
        F.col("d.dimension").alias("dimension"),
        F.posexplode("d.value").alias("offset", "value"),
    ).filter(F.col("value").isNotNull())
    # one row per (point, dimension k); _nd = expected dim count, so
    # the final aggregate can drop POINTS with any failed lookup
    # (the decoder skips the whole point, not just the broken dim)
    k = pts.select(
        "record_id",
        "offset",
        "value",
        "sizes",
        "dimension",
        F.size("dim_ids").alias("_nd"),
        F.posexplode("dim_ids").alias("k", "dim_name"),
    )
    # malformed-payload guards (the pure decoder's skip rules, ANSI-
    # safe: unguarded element_at/% would THROW on a size/id mismatch,
    # a zero size, or a missing dimension key instead of skipping)
    k = k.filter(
        (F.size("sizes") == F.size("dim_ids"))
        & ~F.exists("sizes", lambda s: s.isNull() | (s <= 0))
    )
    # stride_k = product of sizes after k
    stride = F.aggregate(
        F.slice(F.col("sizes"), F.col("k") + 2, F.size("sizes")),
        F.lit(1).cast("long"),
        lambda acc, x: acc * x,
    )
    coord = (F.col("offset") / stride).cast("long") % F.try_element_at(
        "sizes", F.col("k") + 1
    )
    cat = F.try_element_at("dimension", F.col("dim_name"))["category"]
    # invert index map: position -> category id, then label fallback;
    # duplicate positions (malformed) would make map_from_entries
    # throw, so the inversion is guarded on position uniqueness —
    # a dim with a broken index yields NULL cids and its points drop,
    # the decoder's 'pos not in lookup' rule
    entries = F.transform(
        F.map_entries(cat["index"]),
        lambda e: F.struct(e["value"].alias("pos"), e["key"].alias("cid")),
    )
    positions = F.transform(entries, lambda e: e["pos"])
    inv = F.when(
        F.size(F.array_distinct(positions)) == F.size(positions),
        F.map_from_entries(entries),
    )
    cid = F.try_element_at(inv, coord)
    label = F.coalesce(F.try_element_at(cat["label"], cid), cid)
    coords = k.select(
        "record_id",
        "offset",
        "value",
        "_nd",
        F.col("dim_name"),
        label.alias("category"),
    ).filter(F.col("category").isNotNull())
    return (
        coords.groupBy("record_id", "offset")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("dim_name", "category"))
            ).alias("dims"),
            F.first("value").alias("value"),
            F.count(F.lit(1)).alias("_ok"),
            F.first("_nd").alias("_nd"),
        )
        .filter(F.col("_ok") == F.col("_nd"))  # every dim resolved
        .select("record_id", "dims", "value")
    )
