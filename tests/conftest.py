from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_data4transformation_spark.session import get_spark  # noqa: E402
from elt_data4transformation_spark.sources import TABLES  # noqa: E402

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="elt4t-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _release_cached_blocks(request):
    """Operators persist() bounded intermediates (posting lists, LSH
    candidates, term vectors) and leave cache lifetime to the caller —
    bench.py clearCache()s between queries; do the same between tests
    so 300 tests in one session can't accumulate pinned blocks."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values — mirrors the driver's
    order-insensitive comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != "
        f"{sorted(oracle_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y))
            elif isinstance(x, float) or isinstance(y, float):
                ok = (
                    y is not None
                    and not (isinstance(y, float) and math.isnan(y))
                    and math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9)
                )
            elif hasattr(x, "isoformat") and hasattr(y, "isoformat"):
                ok = str(x) == str(y)
            else:
                ok = x == y
            assert ok, f"{name}.{col}[{i}]: spark={x!r} oracle={y!r}"
