"""10x streaming stress (round-7): run the streaming family at 1x and
10x replicas and record wall time PLUS state-store metrics
(numRowsTotal / memoryUsedBytes per stateful operator, from
StreamingQueryProgress via streaming.events.LAST_STATE_METRICS) — the
measured form of SCALE.md's bounded-state claims.

Reuses scale_stress.replicate: events are fanned 10x under offset
event_ids but UNCHANGED user_ids and timestamps, so per-user
view x purchase pairs grow ~100x BY CONSTRUCTION in the stream-stream
joins (same documented super-linearity as the dedup stress replicas);
state rows should grow ~10x (events per side), which is the claim
under test.

Usage: python scripts/stream_stress.py [replicas] [--unique] [--scaled-k]

``--scaled-k`` sets SPARK_GRAFT_IVF_K=sqrt — REDUNDANT since round 10:
the executable K = ceil(sqrt(N)) rule is now stream_ivf_ingest's
registered DEFAULT (and its oracle checks the chosen K as an output
column), so an unflagged run already measures the sqrt-N regime. The
flag is kept accepted for older invocations; to reproduce the retired
fixed-K cliff instead, pin SPARK_GRAFT_IVF_K=16 (stress-only — a
pinned K diverges from the sqrt-K oracle).

``--unique`` (round-7 VERDICT ask #4) switches the replica fixture to
the NON-duplicate mode (scale_stress.replicate(unique=True)): replica
texts go through per-replica letter-rotation, embedding replicas a
cyclic component shift — so the 10x corpus behaves like 10x genuinely
new documents/vectors and the ingest loops measure the realistic
regime (candidates ~linear) instead of the adversarial mutual-near-dup
flood (candidates ~quadratic, the default mode's documented reading).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.streaming import events as sev  # noqa: E402
from scripts.scale_stress import OUT, SF, replicate  # noqa: E402

QUERIES = [
    "stream_tumbling",
    "stream_dedup_watermark",
    "stream_sessions",
    "stream_stateful_stats",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_index_ingest",
    "stream_ivf_ingest",
]

import os as _os

_env = _os.environ.get("STREAM_STRESS_QUERIES")
if _env:
    QUERIES = [q.strip() for q in _env.split(",") if q.strip()]


def _state_summary() -> list[dict]:
    """Max state rows/bytes per stateful operator across the run's
    micro-batches (the growth figure; per-batch rows stay in
    LAST_STATE_METRICS if needed)."""
    agg: dict[str, dict] = {}
    for m in sev.LAST_STATE_METRICS:
        op = m["operator"] or "?"
        cur = agg.setdefault(
            op, {"operator": op, "max_rows": 0, "max_bytes": 0, "batches": 0}
        )
        cur["max_rows"] = max(cur["max_rows"], m["numRowsTotal"] or 0)
        cur["max_bytes"] = max(cur["max_bytes"], m["memoryUsedBytes"] or 0)
        cur["batches"] += 1
    return sorted(agg.values(), key=lambda d: d["operator"])


def run(name: str, sf_dir: str) -> dict:
    spark = SparkSession.getActiveSession()
    spark.catalog.clearCache()
    sev.LAST_STATE_METRICS.clear()  # don't report a prior query's state
    t0 = time.monotonic()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return {
        "sec": round(time.monotonic() - t0, 3),
        "state": _state_summary(),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    unique = "--unique" in sys.argv[1:]
    scaled_k = "--scaled-k" in sys.argv[1:]
    if scaled_k:
        _os.environ["SPARK_GRAFT_IVF_K"] = "sqrt"
    n = int(args[0]) if args else 10
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .appName("stream-stress")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, n, unique=unique)
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    out = {}
    for q in QUERIES:
        r1 = run(q, SF)
        rn = run(q, OUT)
        out[q] = {
            "t_1x": r1["sec"],
            f"t_{n}x": rn["sec"],
            "ratio": round(rn["sec"] / r1["sec"], 2) if r1["sec"] else None,
            "state_1x": r1["state"],
            f"state_{n}x": rn["state"],
        }
        print(json.dumps({q: out[q]}), flush=True)
    print(json.dumps({
        "replicas": n, "unique": unique, "scaled_k": scaled_k,
        "results": out,
    }))


if __name__ == "__main__":
    main()
