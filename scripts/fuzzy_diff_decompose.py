"""Stage decomposition for snapshot_fuzzy_diff (round-11 verdict ask
#5): time each sub-plan to the noop sink so the residual can be
attributed — if no single stage clears the session floor by a useful
margin, the query is stage-count-bound and a mapInArrow rewrite cannot
pay.

Sub-plans timed (cumulative prefixes of the real plan, so the delta
between consecutive rows is the marginal cost of that stage):
  rows   — corpus scan + word split + both snapshot projections
  vec    — + concept token vectors over the union of labels
  vecp   — + term-id window and position/chunk tagging
  sims   — + the (position, chunk) applyInPandas dense-matmul pass
  full   — the registered query end-to-end
Each is min-of-N after a warm pass.

Usage: python scripts/fuzzy_diff_decompose.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.plans import cluster as C  # noqa: E402
from elt_data4transformation_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="elt4t-fuzzy-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    from elt_data4transformation_spark.functions import concepts
    from elt_data4transformation_spark.plans.cluster import (
        _POSITIONS,
        _FUZZY_THRESHOLD,  # noqa: F401  (kept: documents the knob)
    )
    from elt_data4transformation_spark.sources import table

    def build(upto: str):
        d = table(spark, sf_dir, "documents")
        wds = F.split("text", " ")
        pos = F.element_at(
            F.array(*[F.lit(p) for p in _POSITIONS]),
            ((F.col("doc_id") % 3) + 1).cast("int"),
        )
        pct_prev = F.round(20 + (F.col("doc_id") * 13 % 600) / 10.0, 1)
        base = d.select("doc_id", wds.alias("wds"), pos.alias("position"))
        rows_prev = base.filter(F.col("doc_id") % 5 != 0).select(
            F.col("doc_id").alias("pid"),
            F.array_join(F.slice("wds", 1, 6), " ").alias("label"),
            "position",
            pct_prev.alias("pct"),
        )
        rows_cur = base.filter(F.col("doc_id") % 7 != 0).select(
            F.col("doc_id").alias("cid"),
            F.array_join(F.slice("wds", 2, 6), " ").alias("label"),
            "position",
            F.round(
                20 + (F.col("doc_id") * 13 % 600) / 10.0
                + (F.col("doc_id") % 21) - 10,
                1,
            ).alias("pct"),
        )
        if upto == "rows":
            return rows_prev.unionByName(
                rows_cur.withColumnRenamed("cid", "pid")
            )
        labels = rows_prev.select(
            F.concat(F.lit("p"), F.col("pid").cast("string")).alias("id"),
            F.col("label").alias("text"),
        ).unionByName(
            rows_cur.select(
                F.concat(F.lit("c"), F.col("cid").cast("string")).alias(
                    "id"
                ),
                F.col("label").alias("text"),
            )
        )
        vec = concepts.doc_terms(spark, labels, id_col="id", text_col="text")
        if upto == "vec":
            return vec
        raise ValueError(upto)

    stages = ["rows", "vec", "full"]
    out = {}
    for st in stages:
        def frame():
            if st == "full":
                return REGISTRY["snapshot_fuzzy_diff"].fn(spark, sf_dir)
            return build(st)

        frame().write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        secs = []
        for _ in range(runs):
            t0 = time.monotonic()
            frame().write.format("noop").mode("overwrite").save()
            secs.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        out[st] = {"sec": secs, "min": min(secs)}
    # session floor: a 1-task no-op job
    floors = []
    for _ in range(runs):
        t0 = time.monotonic()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floors.append(round(time.monotonic() - t0, 3))
    out["floor_1task"] = {"sec": floors, "min": min(floors)}
    print(json.dumps({"metric": "fuzzy_diff_decompose", "stages": out}))
    spark.stop()


if __name__ == "__main__":
    main()
