"""Interleaved A/B benchmark — the decisive protocol for
ambient-vs-regression claims (round-10 VERDICT ask #3).

The per-round min-of-5 pair cannot distinguish a real Spark-side
regression from ambient host drift BETWEEN sessions: round 9 read
Spark +12% / DuckDB +4% on the same 202 queries and the quiet-window
floor probes could not settle which. This script removes the
between-session confounder: it checks the OLD tree out as a git
worktree, starts one long-lived Spark worker per tree (old and new),
and times each suspect query ALTERNATELY — A then B, per query, per
round — so any ambient drift hits both trees equally within seconds
of each other. The verdict per query is min-of-N(old) vs min-of-N(new)
from the same interleaved window.

Workers run strictly one at a time (the driver waits for each result
before poking the other tree), so the two JVMs never contend; prepare
hooks run untimed on each worker's first encounter of a query, exactly
like bench.py.

Usage:
  python scripts/ab_interleave.py <old_git_ref> [runs] [q1,q2,...]

Defaults: runs=5; queries = the six round-9 regression suspects.
Emits one JSON line:
  {"metric": "ab_interleave", "old_ref": ..., "runs": N,
   "queries": {name: {"old": s, "new": s, "ratio": new/old,
                      "old_runs": [...], "new_runs": [...]}}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUSPECTS = [
    "leakage_safe_split",
    "dedup_components",
    "kmeans_clusters",
    "levenshtein_lsh_rescore",
    "topic_score",
    "simhash_docs",
]

WORKER_SRC = """
import json, os, sys, time

root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)
from elt_data4transformation_spark.session import get_spark
from elt_data4transformation_spark.plans import REGISTRY

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-worker")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).mapInPandas(lambda it: it, "id long").count()
prepared = set()
print(json.dumps({"ready": True}), flush=True)
for line in sys.stdin:
    name = line.strip()
    if not name:
        continue
    if name == "EXIT":
        break
    spec = REGISTRY[name]
    if name not in prepared:
        prep = getattr(spec, "prepare", None)
        if prep is not None:
            prep(spark, SF)
        prepared.add(name)
    spark.catalog.clearCache()
    t = time.monotonic()
    spec.fn(spark, SF).write.format("noop").mode("overwrite").save()
    print(
        json.dumps({"name": name, "sec": round(time.monotonic() - t, 3)}),
        flush=True,
    )
"""


class Worker:
    def __init__(self, label: str, tree: str, script: str) -> None:
        self.label = label
        self.proc = subprocess.Popen(
            [sys.executable, "-u", script, tree],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        self._read()  # ready marker

    def _read(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker {self.label} died")
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                continue  # stray progress noise
            if isinstance(out, dict):
                return out

    def run(self, name: str) -> float:
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        return self._read()["sec"]

    def stop(self) -> None:
        try:
            self.proc.stdin.write("EXIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    queries = (
        [q for q in sys.argv[3].split(",") if q]
        if len(sys.argv) > 3
        else SUSPECTS
    )

    work = tempfile.mkdtemp(prefix="ab_interleave_")
    old_tree = os.path.join(work, "old")
    script = os.path.join(work, "worker.py")
    with open(script, "w") as fh:
        fh.write(WORKER_SRC)
    subprocess.run(
        ["git", "worktree", "add", "--detach", old_tree, old_ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        a = Worker("old", old_tree, script)
        b = Worker("new", REPO, script)
        times: dict[str, dict[str, list[float]]] = {
            q: {"old": [], "new": []} for q in queries
        }
        # warm pass (prepare hooks + JIT) — NOT recorded
        for q in queries:
            a.run(q)
            b.run(q)
        for _ in range(runs):
            for q in queries:
                times[q]["old"].append(a.run(q))
                times[q]["new"].append(b.run(q))
        a.stop()
        b.stop()
        out = {}
        for q in queries:
            o, n = min(times[q]["old"]), min(times[q]["new"])
            out[q] = {
                "old": o,
                "new": n,
                "ratio": round(n / o, 3) if o else None,
                "old_runs": times[q]["old"],
                "new_runs": times[q]["new"],
            }
        print(
            json.dumps(
                {
                    "metric": "ab_interleave",
                    "old_ref": old_ref,
                    "runs": runs,
                    "queries": out,
                }
            )
        )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", old_tree],
            cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
