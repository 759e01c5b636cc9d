"""Physical-plan regression tests: the scale properties PLANS.md
claims (pushdown, pruning, broadcast strategy, zero-exchange top-k,
no quadratic joins in the dedup family) asserted against the FINAL
adaptive plan, so a refactor can't silently trade them away.

Each test runs the registered query at SF_SMALL, collects on the same
Dataset (so AQE finalizes THIS QueryExecution), and inspects the
executed plan's final section — the same extraction as
scripts/explain_audit.py, which generates PLANS.md.
"""

from __future__ import annotations

import re

from elt_data4transformation_spark.plans import REGISTRY
from tests.conftest import SF_SMALL


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _count(plan: str, pat: str) -> int:
    return sum(1 for line in plan.splitlines() if re.search(pat, line))


def _plan(spark, name: str) -> str:
    return _final_plan(REGISTRY[name].fn(spark, SF_SMALL))


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    # the shipdate predicate must reach the parquet scan ...
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan
    # ... and the scan must NOT read columns the query never touches
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m and "l_comment" not in m.group(1), m and m.group(1)
    assert _count(plan, "Join") == 0


def test_region_revenue_all_dims_broadcast(spark):
    plan = _plan(spark, "region_revenue")
    # 4-dim enrichment must stay broadcast — a shuffle join here means
    # the fact table gets re-partitioned once per dimension at 100 TB
    assert _count(plan, "BroadcastHashJoin") == 4, plan
    assert _count(plan, "SortMergeJoin") == 0, plan
    # fact-side scan pruned to join key + measure columns
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and "l_comment" not in li[0] and "l_shipmode" not in li[0]


def test_top_k_orders_is_single_pass_no_exchange(spark):
    plan = _plan(spark, "top_k_orders")
    assert _count(plan, "TakeOrderedAndProject") >= 1, plan
    assert _count(plan, "Exchange") == 0, plan


def test_dedup_family_never_goes_quadratic(spark):
    # every candidate-generation join must be an equi-join (hash-able);
    # a CartesianProduct or nested-loop join here is the all-pairs
    # explosion the LSH/inverted-index designs exist to avoid
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "title_dedup_merge", "dedup_exact"):
        plan = _plan(spark, name)
        assert _count(plan, "CartesianProduct") == 0, (name, plan)
        assert _count(plan, "BroadcastNestedLoopJoin") == 0, (name, plan)
        assert _count(plan, "SortMergeJoin") == 0, (name, plan)


def test_concept_search_substring_join_is_broadcast(spark):
    # the ~70-row concept table joins by substring match — necessarily
    # a nested-loop join, but it must be the BROADCAST nested loop
    # (concepts to every executor), never a cartesian shuffle
    plan = _plan(spark, "concept_search")
    assert _count(plan, "BroadcastNestedLoopJoin") == 1, plan
    assert _count(plan, "CartesianProduct") == 0, plan


def test_ann_cosine_topk_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "ann_cosine_topk")
    # one broadcast nested-loop (tiny query set against the corpus);
    # the corpus itself is never shuffled into a cartesian product
    assert _count(plan, "BroadcastNestedLoopJoin") == 1, plan
    assert _count(plan, "CartesianProduct") == 0, plan
    # embeddings scan reads only (vec_id, embedding)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert any(s.startswith("vec_id:bigint,embedding:array") for s in schemas), schemas


def test_events_scan_prunes_to_used_columns(spark):
    plan = _plan(spark, "events_tumbling")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert schemas, plan
    # payload-ish columns must not be read by the windowed aggregate
    assert all("payload" not in s and "user_agent" not in s for s in schemas), schemas


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's runtime bloom-filter join pruning (InjectRuntimeFilter)
    is available and fires when the creation side is selective — the
    mechanism that turns a filtered-dim join into a semi-pruned fact
    scan at 100 TB. Size thresholds are lowered to make the sf0.001
    fixture eligible; production defaults (10 GB application side)
    gate it to genuinely large scans."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.sources import table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # injection targets shuffle joins; a broadcastable dim would
        # short-circuit it (the broadcast side is already its own filter)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, SF_SMALL, "lineitem")
        o = table(spark, SF_SMALL, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        plan = _final_plan(
            j.groupBy("o_orderpriority").agg(F.sum("l_quantity"))
        )
        assert "might_contain" in plan  # bloom probe on the fact scan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --- round-2 cross-operator invariants -------------------------------------


def test_containment_dominates_jaccard_everywhere(spark):
    """|A∩B|/min >= |A∩B|/|A∪B| for every pair, and both in (0, 1]."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.functions import textfns as T
    from elt_data4transformation_spark.operators.dedup_ops import (
        jaccard_pairs,
    )
    from elt_data4transformation_spark.sources import spread, table

    d = spread(table(spark, "/root/testdata/sf0.001", "documents"))
    g = d.select(
        "doc_id",
        "lang",
        T.word_ngrams_col(3, T.words_col()).alias("grams"),
    ).filter(F.size(T.words_col()) >= 3)
    pdf = (
        jaccard_pairs(g, "doc_id", "grams", block_col="lang")
        .withColumn(
            "cont",
            F.col("inter_size").cast("double") / F.least("n_a", "n_b"),
        )
        .select("jac", "cont")
        .toPandas()
    )
    assert len(pdf) > 0
    assert (pdf.cont >= pdf.jac - 1e-12).all()
    assert ((pdf.jac > 0) & (pdf.cont <= 1.0 + 1e-12)).all()


def test_bigram_lm_probability_mass_bounded(spark):
    """Kept continuations' probability mass never exceeds 1 per
    context (ctx_n counts ALL continuations, kept or not)."""
    from elt_data4transformation_spark.plans.text import bigram_lm

    pdf = bigram_lm(spark, "/root/testdata/sf0.001").toPandas()
    mass = pdf.groupby("context").prob.sum()
    assert (mass <= 1.0 + 1e-6).all()


def test_stratified_sample_exact_k_disjoint_deterministic(spark):
    """Exactly min(k, stratum size) rows per language, no doc sampled
    twice, and two runs agree row-for-row."""
    from elt_data4transformation_spark.plans.corpus import (
        _STRAT_K,
        stratified_sample,
    )

    a = stratified_sample(spark, "/root/testdata/sf0.001").toPandas()
    b = stratified_sample(spark, "/root/testdata/sf0.001").toPandas()
    assert a.equals(b)
    sizes = a.groupby("lang").size()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    for lang, n in sizes.items():
        assert n == min(_STRAT_K, docs[lang])
    assert a.doc_id.is_unique


def test_cluster_canonical_token_accounting_vs_components(spark):
    """cluster_canonical's member count must agree with
    dedup_components' component sizes for every multi-member
    component (singletons are canonical-only rows)."""
    from elt_data4transformation_spark.plans.dedup import (
        cluster_canonical,
        dedup_components,
    )

    canon = (
        cluster_canonical(spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("component")
    )
    comp = dedup_components(spark, "/root/testdata/sf0.001").toPandas()
    sizes = comp.groupby("component").size()
    for cid, n in sizes.items():
        assert canon.loc[cid, "n_members"] == n
