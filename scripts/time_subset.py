"""Ad-hoc steady-state timer for a subset of registered queries.

Usage: python scripts/time_subset.py name [name ...]
Runs each query's prepare hook untimed, then times TWO noop-sink
executions (first = carries codegen, second = steady state). Same
measurement conventions as bench.py (clearCache between runs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="elt4t-time-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()
    n = spark.sparkContext.defaultParallelism
    (
        spark.range(n).repartition(n)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )
    for name in names:
        spec = REGISTRY[name]
        if spec.prepare is not None:
            spec.prepare(spark, sf_dir)
            spark.catalog.clearCache()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: first={runs[0]} steady={runs[1]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
