"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from elt_data4transformation_spark.plans import REGISTRY
from tests.conftest import SF_SMALL, assert_frames_match

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_SMALL).toPandas()
    oracle_pdf = oracle_con.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)
