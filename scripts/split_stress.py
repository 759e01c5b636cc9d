"""Measured regime change for width-bounded split compaction: build a
fixed-K=16 IVF index over an R-replica decorrelated embedding corpus
(the realistic "corpus grew Rx" case — every bucket grows ~Rx, which
the RELATIVE skew bound never fires on), time an n-probe batch, then
split_until_bounded to the ABSOLUTE bound max_width = ceil(2*sqrt(N))
and time the same probes again.

This is the stored-index twin of ann_ivf_scaled's measured build-time
rule: the split grows K toward ~sqrt(N)/2 by touching only over-bound
buckets, so per-probe work drops from ~N/16 to ~2*sqrt(N) without the
full re-train. In-index probes read their bucket only (assignment is a
stored fact); an external query additionally pays the K-row centroid
scan — that K-vs-width tradeoff is exactly what the 2*sqrt(N) bound
balances.

Replica decorrelation matches scripts/scale_stress.py --unique:
replica i's embedding gets a cyclic component shift, which in 64-dim
space drops cross-replica cosine to ~0 while keeping norms and
component distributions identical.

Usage: python scripts/split_stress.py [replicas] [n_probes]
Defaults: 50 replicas (100k vectors at sf0.1), 500 probes.
Emits one JSON line; rows recorded in SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from functools import reduce

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from elt_data4transformation_spark.operators import artifacts  # noqa: E402
from elt_data4transformation_spark.operators.vectors import (  # noqa: E402
    cosine_col,
    split_until_bounded,
)
from elt_data4transformation_spark.plans.similarity import (  # noqa: E402
    _ivf_builder,
)
from elt_data4transformation_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/split_stress"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark(app_name="split-stress")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base_k = emb.agg(F.max("vec_id")).first()[0] + 1
    parts = []
    for i in range(reps):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * base_k))
        if i > 0:
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), i % 32 + 2, 10_000),
                    F.slice(F.col("embedding"), 1, i % 32 + 1),
                ),
            )
        parts.append(p)
    vec = reduce(lambda a, b: a.unionByName(b), parts).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = vec.count()

    idx_path = f"{OUT}/idx"
    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    artifacts.publish(idx_path, "split-stress", _ivf_builder(vec))
    build_s = round(time.time() - t0, 3)

    def widths() -> dict:
        w = (
            spark.read.parquet(f"{idx_path}/index")
            .groupBy("centroid_id")
            .count()
        )
        row = w.agg(
            F.count("*").alias("k"),
            F.max("count").alias("max_w"),
            F.round(F.avg("count"), 1).alias("avg_w"),
        ).first()
        return {"k": row["k"], "max_w": row["max_w"], "avg_w": row["avg_w"]}

    def probe_time(runs: int = 3) -> float:
        best = None
        for _ in range(runs):
            t = time.time()
            idx = spark.read.parquet(f"{idx_path}/index")
            q = idx.filter(F.col("vec_id") < n_probes).select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("centroid_id").alias("qc"),
            )
            scored = idx.join(
                F.broadcast(q),
                (F.col("centroid_id") == F.col("qc"))
                & (F.col("vec_id") != F.col("query_id")),
            ).select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine_col("qv", "v"), 6).alias("cos"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("cos"), "neighbor_id"
            )
            (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            dt = time.time() - t
            best = dt if best is None or dt < best else best
        return round(best, 3)

    def recall_at_5(sample: int = 200) -> float:
        """IVF recall@5 vs brute force for the first ``sample`` probe
        ids: |ivf_top5 ∩ brute_top5| / 5 averaged over queries. The
        split narrows buckets, so recall can only drop — measure the
        cost side of the probe win, don't assert it away."""
        idx = spark.read.parquet(f"{idx_path}/index")
        q = idx.filter(F.col("vec_id") < sample).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("centroid_id").alias("qc"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), "neighbor_id"
        )

        def top5(joined) -> DataFrame:
            return (
                joined.select(
                    "query_id",
                    F.col("vec_id").alias("neighbor_id"),
                    F.round(cosine_col("qv", "v"), 6).alias("cos"),
                )
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .select("query_id", "neighbor_id")
            )

        ivf = top5(
            idx.join(
                F.broadcast(q),
                (F.col("centroid_id") == F.col("qc"))
                & (F.col("vec_id") != F.col("query_id")),
            )
        )
        brute = top5(
            vec.crossJoin(F.broadcast(q.drop("qc"))).filter(
                F.col("vec_id") != F.col("query_id")
            )
        )
        hits = ivf.join(brute, ["query_id", "neighbor_id"]).count()
        return round(hits / (5.0 * sample), 3)

    before = {**widths(), "probe_s": probe_time(), "recall5": recall_at_5()}

    target = math.ceil(2 * math.sqrt(n))
    t0 = time.time()
    n_split = split_until_bounded(spark, idx_path, max_width=target)
    split_s = round(time.time() - t0, 3)

    after = {**widths(), "probe_s": probe_time(), "recall5": recall_at_5()}

    # nprobe=3 over the split index: the standard recall compensation
    # for finer buckets — probe the 3 nearest centroids instead of the
    # home bucket. Candidates/query ~ 3*avg_w, still far below one
    # fixed-K fat bucket.
    def nprobe(p: int, sample: int, timed: bool) -> dict:
        idx = spark.read.parquet(f"{idx_path}/index")
        cent = spark.read.parquet(f"{idx_path}/centroids")
        q = idx.filter(F.col("vec_id") < sample).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        cw = Window.partitionBy("query_id").orderBy(
            F.desc("ccos"), "centroid_id"
        )
        qc = (
            q.crossJoin(F.broadcast(cent))
            .withColumn("ccos", F.round(cosine_col("qv", "cv"), 6))
            .withColumn("crn", F.row_number().over(cw))
            .filter(F.col("crn") <= p)
            .select("query_id", "qv", "centroid_id")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), "neighbor_id"
        )
        top = (
            idx.join(F.broadcast(qc), "centroid_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine_col("qv", "v"), 6).alias("cos"),
            )
            .dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id")
        )
        if timed:
            best = None
            for _ in range(3):
                t = time.time()
                top.write.format("noop").mode("overwrite").save()
                dt = time.time() - t
                best = dt if best is None or dt < best else best
            return {"probe_s": round(best, 3)}
        brute = (
            vec.crossJoin(
                F.broadcast(
                    idx.filter(F.col("vec_id") < sample).select(
                        F.col("vec_id").alias("query_id"),
                        F.col("v").alias("qv"),
                    )
                )
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine_col("qv", "v"), 6).alias("cos"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id")
        )
        hits = top.join(brute, ["query_id", "neighbor_id"]).count()
        return {"recall5": round(hits / (5.0 * sample), 3)}

    after_np3 = {
        **nprobe(3, 2000, timed=True),
        **nprobe(3, 200, timed=False),
    }

    print(
        json.dumps(
            {
                "metric": "split_stress",
                "replicas": reps,
                "n_vectors": n,
                "n_probes": n_probes,
                "max_width_target": target,
                "build_s": build_s,
                "before": before,
                "after": after,
                "after_nprobe3": after_np3,
                "clusters_split": n_split,
                "split_s": split_s,
                "probe_speedup": round(
                    before["probe_s"] / after["probe_s"], 2
                )
                if after["probe_s"]
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
