"""Assemble a stall-robust matched pair: per-query MINIMUM over N
strictly-sequential full runs of the SAME tree, applied symmetrically
to the Spark and DuckDB sides.

Why: the bench host exhibits bursty multi-second hypervisor stalls
(nonzero /proc/stat steal; the same query measures e.g. 2.3 s in one
full run and 19.0 s in the next, with different victims each run —
round 8 observed 35-90 such inflations per run while
session_floor_probe stayed 0.14-0.21 s). A single-run pair therefore
carries a handful of random 3-15 s outliers on whichever queries a
stall happened to hit. The per-query minimum over same-tree sequential
runs removes exactly that additive noise and nothing else: every
retained number IS a complete real execution of that query (cold
codegen included, same protocol as the single-run pairs), and both
engines get the identical treatment.

Usage:
  python scripts/pair_min.py out.json in1.json in2.json [...]

Emits the same JSON shape as bench.py / bench_duckdb.py, with extra
keys: runs (per-run totals), basis ("per-query min of N runs").
Side-specific extras of the FIRST input (e.g. full_queries from
bench_duckdb.py) are carried through, min-reduced when they are
per-query dicts present in every input.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out, first, rest = sys.argv[1], sys.argv[2], sys.argv[3:]
    docs = [json.load(open(p)) for p in [first, *rest]]
    base = dict(docs[0])
    names = set(docs[0]["queries"])
    for d in docs[1:]:
        if set(d["queries"]) != names:
            # not assert: must survive python -O — silently merging
            # runs over different registries would fabricate a total
            raise SystemExit("pair_min: runs cover different registries")
    def best(vals: list[float]) -> float:
        # bench.py records -1.0 for a query that FAILED in that run;
        # a failure is a missing measurement, not a fast one — min()
        # over raw values would select the sentinel and corrupt the
        # total. Keep the min of the real measurements; only if every
        # run failed does the sentinel survive.
        ok = [v for v in vals if v >= 0]
        return round(min(ok), 3) if ok else -1.0

    queries = {n: best([d["queries"][n] for d in docs]) for n in names}
    base["queries"] = queries
    base["value"] = round(sum(v for v in queries.values() if v >= 0), 3)
    base["runs"] = [d["value"] for d in docs]
    base["basis"] = f"per-query min of {len(docs)} sequential runs"
    # min-reduce any side-specific per-query dicts (e.g. full_queries)
    for key, val in list(base.items()):
        if (
            key != "queries"
            and isinstance(val, dict)
            and all(isinstance(x, (int, float)) for x in val.values())
            and all(key in d and set(d[key]) == set(val) for d in docs)
        ):
            # same -1.0 failure-sentinel rule as the primary queries
            # dict: a failed run is a missing measurement, not a fast
            # one, and bench_duckdb.py records the sentinel into
            # full_queries too.
            base[key] = {n: best([d[key][n] for d in docs]) for n in val}
    with open(out, "w") as fh:
        fh.write(json.dumps(base) + "\n")
    print(out, "value", base["value"], "runs", base["runs"])


if __name__ == "__main__":
    main()
