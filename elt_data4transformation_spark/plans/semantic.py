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


# --- BM25 lexical ranking --------------------------------------------------

_BM25_TERMS = ("table", "window")
_BM25_K1, _BM25_B = 1.2, 0.75




def _bm25_tf_sql() -> str:
    return ", ".join(
        f"LEN(LIST_FILTER(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )


def _bm25_df_sql() -> str:
    return ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )


def _bm25_hits_sql() -> str:
    return " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(_BM25_TERMS))
    )


def _bm25_tft_sql() -> str:
    return " + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))



def _bm25_score_sql() -> str:
    parts = []
    for i in range(len(_BM25_TERMS)):
        parts.append(
            f"LN((s.n_docs - d.df_{i} + 0.5) / (d.df_{i} + 0.5) + 1.0)"
            f" * (tf_{i} * ({_BM25_K1} + 1.0))"
            f" / (tf_{i} + {_BM25_K1} * (1.0 - {_BM25_B}"
            f" + {_BM25_B} * dl / s.avgdl))"
        )
    return " + ".join(parts)


@register(
    "bm25_score",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
                   LEN(STRING_SPLIT(text, ' ')) AS dl
            FROM documents
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM docs
        ),
        tf AS (
            SELECT doc_id, dl, {_bm25_tf_sql()}
            FROM docs
        ),
        df AS (
            SELECT {_bm25_df_sql()}
            FROM tf
        )
        SELECT doc_id,
               {_bm25_hits_sql()} AS n_hit_terms,
               ROUND({_bm25_score_sql()}, 6) AS score
        FROM tf CROSS JOIN stats s CROSS JOIN df d
        WHERE {_bm25_tft_sql()} > 0
        ORDER BY doc_id
    """,
    tags=("semantic", "search"),
    doc="BM25 lexical ranking for the fixed query terms (k1="
    f"{_BM25_K1}, b={_BM25_B}): per-term tf from the token array, "
    "corpus df/avgdl from two tiny aggregates broadcast back as "
    "literals-via-cross-join, Robertson idf ln((N-df+.5)/(df+.5)+1). "
    "Completes the search family (search_union is the boolean+cosine "
    "path; this is the ranked-retrieval scorer a reference user gets "
    "from Postgres ts_rank). Scale shape: one pass for tf (projection), "
    "one 1-row aggregate for stats, score is a pure expression — no "
    "shuffle of the corpus; at 100 TB df/avgdl come from the same "
    "aggregate pushed map-side.",
)
def bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    docs = d.select("doc_id", w.alias("w"), F.size(w).cast("long").alias("dl"))

    def tf_col(term: str):
        def factory(t):
            return lambda x: x == F.lit(t)

        return F.size(F.filter("w", factory(term))).cast("long")

    tf = docs.select(
        "doc_id",
        "dl",
        *[tf_col(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = tf.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    joined = tf.crossJoin(F.broadcast(stats))
    score = None
    hits = None
    for i in range(len(_BM25_TERMS)):
        tfi, dfi = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            (F.col("n_docs") - dfi + 0.5) / (dfi + 0.5) + 1.0
        )
        part = idf * (tfi * (_BM25_K1 + 1.0)) / (
            tfi
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
        hit = F.when(tfi > 0, 1).otherwise(0)
        score = part if score is None else score + part
        hits = hit if hits is None else hits + hit
    return (
        joined.select(
            "doc_id",
            hits.alias("n_hit_terms"),
            F.round(score, 6).alias("score"),
            sum(
                (F.col(f"tf_{i}") for i in range(1, len(_BM25_TERMS))),
                F.col("tf_0"),
            ).alias("_tft"),
        )
        .filter(F.col("_tft") > 0)
        .drop("_tft")
        .orderBy("doc_id")
    )


# --- Iterative PageRank over the citation graph ---------------------------

_PR_DAMP = 0.85
_PR_ITERS = 5


def _pr_edges_sql() -> str:
    # deterministic citation edges derived from doc_id arithmetic
    # (3 outgoing citations per doc, self-citations dropped)
    return """
        SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src, (doc_id * 7 + 1) % n AS dst FROM docs
            UNION ALL
            SELECT doc_id, (doc_id * 13 + 2) % n FROM docs
            UNION ALL
            SELECT doc_id, (doc_id * 3 + 5) % n FROM docs
        ) WHERE src <> dst
    """


def _pr_iter_sql(prev: str, nxt: str) -> str:
    # every term cast to DOUBLE: bare 0.85/1.0 literals are DECIMAL in
    # DuckDB, whose per-step rounding drifts ~0.5% from Spark's IEEE
    # doubles over 5 iterations
    return f"""
        {nxt} AS (
            SELECT n.doc_id,
                   (CAST(1 AS DOUBLE) - {_PR_DAMP}) / nn.n
                   + CAST({_PR_DAMP} AS DOUBLE)
                     * COALESCE(SUM(p.pr / od.deg), 0) AS pr
            FROM nodes n CROSS JOIN nn
            LEFT JOIN edges e ON e.dst = n.doc_id
            LEFT JOIN {prev} p ON p.doc_id = e.src
            LEFT JOIN outdeg od ON od.doc_id = e.src
            GROUP BY n.doc_id, nn.n
        )
    """


def _pagerank_oracle() -> str:
    iters = ",\n".join(
        _pr_iter_sql(f"p{i}", f"p{i + 1}") for i in range(_PR_ITERS)
    )
    return f"""
        WITH docs AS (
            SELECT doc_id, (SELECT COUNT(*) FROM documents) AS n
            FROM documents
        ),
        edges AS ({_pr_edges_sql()}),
        nodes AS (SELECT doc_id FROM docs),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        outdeg AS (SELECT src AS doc_id, COUNT(*) AS deg FROM edges GROUP BY src),
        p0 AS (SELECT doc_id, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes, nn),
        {iters},
        ranked AS (
            -- rank by the ROUNDED score: engines agree on pr only to
            -- ~1e-15 relative (summation order), so an unrounded sort
            -- can flip the top-k boundary between near-ties
            SELECT doc_id, ROUND(pr * 1000000, 4) AS pr_ppm,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND(pr * 1000000, 4) DESC, doc_id) AS rank
            FROM p{_PR_ITERS}
        )
        SELECT rank, doc_id, pr_ppm
        FROM ranked WHERE rank <= 50
        ORDER BY rank
    """


@register(
    "pagerank_citations",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "semantic"),
    doc=f"PageRank (damping {_PR_DAMP}, {_PR_ITERS} fixed iterations) "
    "over a deterministic citation graph derived from doc_id "
    "arithmetic — the influence-ranking companion to citation_follow "
    "(T14) and the second iterative distributed algorithm beside "
    "dedup_components. Spark side: per-iteration join-aggregate on the "
    "(dst-keyed) edge list — contributions = rank/outdegree shuffled "
    "on dst, one shuffle per iteration, no driver state; oracle is the "
    "same recurrence unrolled as chained CTEs. Scores emitted as "
    "rounded parts-per-million so float summation order cannot flip "
    "the hash; top-50 via rank window on the final vector only.",
)
def pagerank_citations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_ops import topk_per_group

    d = spread(table(spark, sf_dir, "documents")).select("doc_id")
    n_docs = d.count()
    cite = None
    for a, b in ((7, 1), (13, 2), (3, 5)):
        part = d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * a + b) % n_docs).alias("dst"),
        )
        cite = part if cite is None else cite.unionByName(part)
    edges = cite.filter(F.col("src") != F.col("dst")).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges pre-joined with outdegree once, then materialized via
    # localCheckpoint: every iteration re-reads the checkpointed
    # partitions instead of replanning the edge derivation, and the
    # 5-iteration lineage stays flat (same rule as dedup_components)
    ed = edges.join(outdeg, "src").localCheckpoint(eager=False)
    # zero rows keep dangling / no-inflow nodes in every iteration's
    # aggregate, replacing a per-iteration (nodes LEFT JOIN contrib)
    # shuffle join with a union feeding the same groupBy — one shuffle
    # per iteration instead of two
    # both lazy: materialization folds into the first iteration's job
    # (which computes all partitions), saving two eager pre-jobs
    zeros = d.select("doc_id", F.lit(0.0).alias("c")).localCheckpoint(
        eager=False
    )
    ranks = d.select("doc_id", (F.lit(1.0) / n_docs).alias("pr"))
    base = (1.0 - _PR_DAMP) / n_docs
    for _ in range(_PR_ITERS):
        contrib = ed.join(ranks, ed["src"] == ranks["doc_id"]).select(
            F.col("dst").alias("doc_id"),
            (F.col("pr") / F.col("deg")).alias("c"),
        )
        ranks = (
            zeros.unionByName(contrib)
            .groupBy("doc_id")
            .agg((F.lit(base) + _PR_DAMP * F.sum("c")).alias("pr"))
        )
    # rank by the ROUNDED score — see the oracle note on near-tie flips
    ppm = ranks.select(
        "doc_id", F.round(F.col("pr") * 1000000, 4).alias("pr_ppm")
    )
    top = topk_per_group(
        ppm, [], [F.desc("pr_ppm"), F.asc("doc_id")], 50, rank_name="rank"
    )
    return top.select("rank", "doc_id", "pr_ppm").orderBy("rank")


# --- Hybrid retrieval: BM25 + embedding cosine via RRF --------------------

_RRF_K = 60        # standard reciprocal-rank-fusion constant
_HY_LIST = 100     # depth of each per-modality candidate list
_HY_TOP = 50       # fused result size
_HY_QVEC = 3       # embeddings.vec_id serving as the dense query vector


def _hybrid_oracle() -> str:
    from ..operators.vectors import cosine_sql

    return f"""
        WITH docs AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
                   LEN(STRING_SPLIT(text, ' ')) AS dl
            FROM documents
        ),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM docs),
        tf AS (SELECT doc_id, dl, {_bm25_tf_sql()} FROM docs),
        df AS (SELECT {_bm25_df_sql()} FROM tf),
        lex AS (
            SELECT doc_id, ROUND({_bm25_score_sql()}, 6) AS s
            FROM tf CROSS JOIN stats s CROSS JOIN df d
            WHERE {_bm25_tft_sql()} > 0
        ),
        lexr AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS lex_rank
            FROM lex QUALIFY lex_rank <= {_HY_LIST}
        ),
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {_HY_QVEC}),
        vec AS (
            SELECT e.vec_id AS doc_id,
                   ROUND({cosine_sql('q.qv', 'e.v')}, 6) AS cos
            FROM e CROSS JOIN q WHERE e.vec_id <> {_HY_QVEC}
        ),
        vecr AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
            FROM vec QUALIFY vec_rank <= {_HY_LIST}
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
                   CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
                   CAST(COALESCE(v.vec_rank, 0) AS BIGINT) AS vec_rank,
                   ROUND(COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0)
                       + COALESCE(1.0 / ({_RRF_K} + v.vec_rank), 0), 6
                   ) AS rrf
            FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
                   AS rank,
               doc_id, lex_rank, vec_rank, rrf
        FROM fused QUALIFY rank <= {_HY_TOP}
        ORDER BY rank
    """


@register(
    "hybrid_rrf_search",
    oracle=_hybrid_oracle(),
    tags=("semantic", "search", "similarity"),
    doc="Hybrid two-tower retrieval with reciprocal rank fusion "
    f"(k={_RRF_K}): the BM25 lexical top-{_HY_LIST} and the "
    f"embedding-cosine dense top-{_HY_LIST} (query = stored vector "
    f"{_HY_QVEC}) fuse by sum of 1/(k+rank), missing-modality rank "
    "coalesced to 0. Completes the search family: boolean+cosine "
    "(search_union), ranked lexical (bm25_score), dense ANN "
    "(ann_cosine_topk / ann_ivf_topk), fused (this). Scale shape: "
    "each modality is a linear scan + skew-free two-phase top-k "
    "(topk_per_group — no single-task global window); the fusion "
    "join touches only 2x100 rows regardless of corpus size. Ranks "
    "order by the ROUNDED score so float summation order cannot flip "
    "near-ties across engines.",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_ops import topk_per_group
    from ..operators.vectors import cosine_col
    from .similarity import _vectors

    lex = bm25_score(spark, sf_dir).select("doc_id", "score")
    lexr = topk_per_group(
        lex, [], [F.desc("score"), F.asc("doc_id")], _HY_LIST,
        rank_name="lex_rank",
    ).select("doc_id", F.col("lex_rank").cast("long").alias("lex_rank"))

    e = _vectors(spark, sf_dir).select("vec_id", "v")
    q = e.filter(F.col("vec_id") == _HY_QVEC).select(
        F.col("v").alias("qv")
    )
    vec = (
        e.filter(F.col("vec_id") != _HY_QVEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
    )
    vecr = topk_per_group(
        vec, [], [F.desc("cos"), F.asc("doc_id")], _HY_LIST,
        rank_name="vec_rank",
    ).select("doc_id", F.col("vec_rank").cast("long").alias("vec_rank"))

    fused = (
        lexr.join(vecr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
            F.round(
                F.coalesce(
                    1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
        )
    )
    top = topk_per_group(
        fused, [], [F.desc("rrf"), F.asc("doc_id")], _HY_TOP,
        rank_name="rank",
    )
    return top.select(
        "rank", "doc_id", "lex_rank", "vec_rank", "rrf"
    ).orderBy("rank")
