"""The DuckDB prepared bench forms (scripts/duck_prepared.py) are pure
mechanical rewrites: for every prepare-tagged query, materializing the
store CTEs as temp tables and probing them must return EXACTLY the
rows of the self-contained registered oracle. This is the correctness
gate on round-8's like-for-like bench fix — any drift between the two
forms would silently falsify the published stored-family ratios."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_data4transformation_spark.plans import REGISTRY  # noqa: E402
from elt_data4transformation_spark.sources import TABLES  # noqa: E402
from scripts.duck_prepared import (  # noqa: E402
    PREPARED_STORE_CTES,
    ensure_prepared,
)
from tests.conftest import SF_SMALL, assert_frames_match  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


_BUILT: set[str] = set()


def test_every_prepare_hook_has_a_prepared_form():
    """The map covers exactly the prepare-tagged queries with oracles,
    so a new stored-artifact query can't silently fall back to the
    asymmetric rebuild-inline measurement."""
    tagged = {
        n
        for n, s in REGISTRY.items()
        if getattr(s, "prepare", None) and s.oracle
    }
    assert tagged == set(PREPARED_STORE_CTES)


@pytest.mark.parametrize("name", sorted(PREPARED_STORE_CTES))
def test_prepared_probe_matches_full_oracle(duck, name):
    spec = REGISTRY[name]
    probe = ensure_prepared(duck, name, spec.oracle, _BUILT)
    got = duck.execute(probe).df()
    want = duck.execute(spec.oracle).df()
    assert_frames_match(got, want, f"{name} (prepared vs full)")
