"""Exact-hash audit: run every registered query vs its DuckDB oracle and
compare like the driver does — columns sorted by name, rows sorted, cell
values compared EXACTLY (no float tolerance) plus per-column dtype drift.

Usage: python scripts/exact_hash_audit.py [sf_dir] [name ...]
Default sf_dir /root/testdata/sf0.01 (the driver's correctness SF).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.session import get_spark  # noqa: E402
from elt_data4transformation_spark.sources import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cell_repr(v):
    """Driver-equivalent cell identity: stringified value. Integer width
    (int32 vs int64) and datetime unit (ns vs us) do NOT differ; int vs
    float DOES (967 vs 967.0 — the DuckDB HUGEINT trap)."""
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if hasattr(v, "isoformat"):
        return str(v)
    return f"{type(v).__name__}:{v!r}"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="exact-hash-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = []
    names = sorted(n for n, s in REGISTRY.items() if s.oracle)
    if only:
        names = [n for n in names if n in only]
    for name in names:
        spec = REGISTRY[name]
        try:
            a = normalize(spec.fn(spark, sf_dir).toPandas())
            b = normalize(con.execute(spec.oracle).df())
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {exc}")
            bad.append(name)
            continue
        spark.catalog.clearCache()
        if len(a) != len(b):
            print(f"ROWS  {name}: spark={len(a)} oracle={len(b)}")
            bad.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(f"COLS  {name}: {list(a.columns)} vs {list(b.columns)}")
            bad.append(name)
            continue
        diffs = []
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            ncell = sum(1 for x, y in zip(av, bv) if cell_repr(x) != cell_repr(y))
            if ncell:
                ex = next(
                    (x, y) for x, y in zip(av, bv) if cell_repr(x) != cell_repr(y)
                )
                diffs.append(f"cells[{col}]: {ncell} diff, e.g. {ex[0]!r} vs {ex[1]!r}")
        if diffs:
            print(f"HASH  {name}: " + "; ".join(diffs))
            bad.append(name)
        else:
            print(f"ok    {name} ({len(a)} rows)")
    print(f"\n{len(names) - len(bad)}/{len(names)} exact-match; bad: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
