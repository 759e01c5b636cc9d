"""Dump `.explain("formatted")` for named queries to plans/<round>/.

Usage: python scripts/dump_plans.py <suffix> name [name ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt (suffix =
before|after; round defaults to r11).

The formatted plan is captured AFTER executing the query to the noop
sink so the AQE-final plan is what lands in the file (the initial plan
hides runtime join rewrites and coalesced exchanges); both the
pre-execution formatted explain and the final executed plan are
written, clearly separated.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="elt4t-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY[name]
        if spec.prepare is not None:
            spec.prepare(spark, sf_dir)
            spark.catalog.clearCache()
        df = spec.fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # execute so AQE finalizes, then capture the executed plan too
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        final = final.split("== Initial Plan ==")[0]
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"# {name} ({suffix}) — explain('formatted')\n\n")
            fh.write(formatted)
            fh.write("\n\n# AQE-final executed plan\n\n")
            fh.write(final)
        print(f"wrote {name}_{suffix}.txt")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
