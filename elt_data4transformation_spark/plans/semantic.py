"""Concept-map semantic search (SURVEY §2.9 T7/T8:
study_scraper/clustering.py:42-221, storage/postgres.py:961-988).

The reference's offline semantic backend as a distributed plan: sparse
concept-weighted token vectors per document, cosine against a constant
query with pipe-separated recall alternatives, best-alternative
scoring, threshold 0.35 (SEARCH_THRESHOLD — recall-oriented; the
cluster path re-groups at 0.72 precision later).

Scale design: the query string is a CONSTANT, so its vector is
computed once on the driver (`question_vector`, the pure-Python twin)
and folded into the aggregation as a literal term->weight lookup —
the big side never joins anything except the ~70-row broadcast concept
table. One token-level shuffle on (doc, term), one tiny shuffle on
doc. At 100 TB this is two map-side-combining hash aggregates over
the token stream; no driver collect, no cross join.
"""

from __future__ import annotations

from math import sqrt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import concepts as C
from ..sources import spread, table
from .registry import register

# Query with recall alternatives (T8: '|'-separated, best-alternative
# scoring). The extra demo concepts exercise the compound-substring
# path on the fixture vocabulary ("table" contains "tab"; "stream" and
# "batch" both fold to the "pipeline" concept — the DE/EN folding
# pattern on engine-domain words).
_QUERY = "table scan|data stream"
_EXTRA = {"tab": ("table",), "stream": ("pipeline",), "batch": ("pipeline",)}

_ALTS = [a.strip() for a in _QUERY.split("|") if a.strip()]
_QVECS = [C.question_vector(a, _EXTRA) for a in _ALTS]
_QNORMS = [sqrt(sum(w * w for w in v.values())) for v in _QVECS]
_THRESHOLD = 0.35


def _dot_sql(vec: dict[str, float]) -> str:
    whens = " ".join(
        f"WHEN '{t}' THEN {w!r}" for t, w in sorted(vec.items())
    )
    return f"SUM(w * CASE term {whens} ELSE 0.0 END)"


def _dot_col(vec: dict[str, float]) -> F.Column:
    lookup = F.create_map(
        *[F.lit(x) for t, w in sorted(vec.items()) for x in (t, w)]
    )
    return F.sum(F.col("w") * F.coalesce(lookup[F.col("term")], F.lit(0.0)))


@register(
    "concept_search",
    oracle=f"""
        WITH {C.doc_terms_sql(extra=_EXTRA)},
        agg AS (
            SELECT id AS doc_id,
                   SQRT(SUM(w * w)) AS n,
                   {", ".join(f"{_dot_sql(v)} AS dot{i}" for i, v in enumerate(_QVECS))}
            FROM vec GROUP BY id
        )
        SELECT doc_id,
               ROUND(GREATEST({", ".join(f"dot{i} / (n * {qn!r})" for i, qn in enumerate(_QNORMS))}), 4) AS sim
        FROM agg
        WHERE ROUND(GREATEST({", ".join(f"dot{i} / (n * {qn!r})" for i, qn in enumerate(_QNORMS))}), 4) >= {_THRESHOLD}
        ORDER BY sim DESC, doc_id
        LIMIT 100
    """,
    tags=("text", "semantic"),
    doc="T7/T8 concept-weighted semantic search "
    "(study_scraper/clustering.py:128-221): fold/tokenize/singularize, "
    "compound-safe substring concept mapping at weight 2.0 (broadcast "
    "NLJ against the ~70-row concept table), sparse cosine vs a "
    "constant query with pipe alternatives, best-alternative >= 0.35. "
    "Query vector driver-computed once and folded in as a literal "
    "lookup — the document side joins nothing non-broadcast.",
)
def concept_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    vec = C.doc_terms(spark, d, extra=_EXTRA)
    agg = vec.groupBy(F.col("id").alias("doc_id")).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("n"),
        *[_dot_col(v).alias(f"dot{i}") for i, v in enumerate(_QVECS)],
    )
    sim = F.round(
        F.greatest(
            *[
                F.col(f"dot{i}") / (F.col("n") * F.lit(qn))
                for i, qn in enumerate(_QNORMS)
            ]
        ),
        4,
    )
    return (
        agg.select("doc_id", sim.alias("sim"))
        .filter(F.col("sim") >= _THRESHOLD)
        .orderBy(F.desc("sim"), "doc_id")
        .limit(100)
    )
