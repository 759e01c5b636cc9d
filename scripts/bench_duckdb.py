"""Time every registered DuckDB oracle at a given SF and emit one JSON
line — the head-to-head the judge runs against BENCH_r{N}.json.

Usage: python scripts/bench_duckdb.py [sf_dir] [out.json]
Default sf_dir /root/testdata/sf0.1. Oracles are full materializations
(``.df()``), mirroring bench.py's noop-sink full execution. DuckDB runs
with all cores (default), same box as the Spark bench.

LIKE-FOR-LIKE (round-8 fix of the standing asymmetry, BENCH_NOTES.md):
for the ~20 queries whose Spark side probes a prebuilt store (registry
``prepare`` hooks, run UNTIMED by bench.py), this bench now runs an
UNTIMED duck prepare too — scripts/duck_prepared.py materializes the
oracle's store CTEs (signatures/centroids/fingerprints/anchors) as
temp tables, and the TIMED query is the probe over them, mirroring
what the Spark side measures. ``queries`` holds the like-for-like
probe times; ``full_queries`` additionally records the old
rebuild-inline times for those queries so prior rounds stay
comparable. Prepared probes are pinned result-identical to the full
oracles by tests/test_duck_prepared.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.sources import TABLES  # noqa: E402
from scripts.duck_prepared import (  # noqa: E402
    PREPARED_STORE_CTES,
    ensure_prepared,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # footer/page-cache warmup, mirroring bench.py's parquet warmup
    con.execute("SELECT COUNT(*) FROM lineitem").fetchall()

    timings: dict[str, float] = {}
    full_timings: dict[str, float] = {}
    built: set[str] = set()
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if not spec.oracle:
            continue
        sql = spec.oracle
        if name in PREPARED_STORE_CTES:
            # UNTIMED store build (the duck twin of bench.py running
            # the Spark prepare hooks untimed); the timed query is the
            # probe. Also record the old rebuild-inline time so prior
            # rounds' numbers stay comparable.
            try:
                sql = ensure_prepared(con, name, spec.oracle, built)
            except Exception as exc:  # noqa: BLE001
                print(f"# duckdb PREPARE FAILED {name}: {exc}",
                      file=sys.stderr)
            t0 = time.perf_counter()
            try:
                con.execute(spec.oracle).df()
                full_timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                full_timings[name] = -1.0
                print(f"# duckdb FULL FAILED {name}: {exc}", file=sys.stderr)
        t0 = time.perf_counter()
        try:
            con.execute(sql).df()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# duckdb FAILED {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # non-sf-suffixed dir; never discard the timings
    line = json.dumps(
        {
            "metric": "duckdb_oracle_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "full_queries": full_timings,
            "sf": sf,
            "n_queries": len(timings),
        }
    )
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
