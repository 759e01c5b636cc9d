"""Pure-operator unit tests with the reference's documented edge cases
(SURVEY §5): merge-policy rules, latest-wins determinism, JSON-stat
decode corners (sparse dict, label fallback, malformed index), LSH on
synthetic near-duplicates, parser edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elt_data4transformation_spark.functions import textfns as T
from elt_data4transformation_spark.operators import (
    dedup_ops,
    jsonstat,
    multimodal,
    upsert,
    vectors,
)


# --- upsert ---------------------------------------------------------------


def test_merge_policy_rules(spark):
    old = spark.createDataFrame(
        [
            (1, ["a"], "2020-01-01", 10.0, "rejected"),
            (2, ["a", "b"], "2020-01-02", 20.0, "kept"),
            (3, None, "2020-01-03", 30.0, "kept"),
        ],
        "id long, topics array<string>, first_seen string, val double, status string",
    )
    new = spark.createDataFrame(
        [
            (1, ["c"], "2021-01-01", 11.0, "kept"),
            (2, ["b", "d"], "2021-01-02", None, "review"),
            (4, ["e"], "2021-01-04", 40.0, "review"),
        ],
        "id long, topics array<string>, first_seen string, val double, status string",
    )
    out = {
        r["id"]: r
        for r in upsert.merge_policy_upsert(
            old,
            new,
            keys=["id"],
            array_union_cols=("topics",),
            sticky_cols=("first_seen",),
            fresh_cols=("val",),
            status_col="status",
        ).collect()
    }
    # sticky rejected status survives the new 'kept'
    assert out[1]["status"] == "rejected"
    assert sorted(out[1]["topics"]) == ["a", "c"]
    assert out[1]["first_seen"] == "2020-01-01"  # sticky
    assert out[1]["val"] == 11.0  # fresh
    # null new value falls back to old
    assert out[2]["val"] == 20.0
    assert out[2]["status"] == "review"
    assert sorted(out[2]["topics"]) == ["a", "b", "d"]
    # null old array treated as empty
    assert out[3]["topics"] == []
    # insert-only row passes through
    assert out[4]["val"] == 40.0 and out[4]["status"] == "review"


def test_latest_wins_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "2020", 1, "a"), (1, "2020", 2, "b"), (1, "2019", 3, "c")],
        "k long, version string, uid long, payload string",
    )
    row = upsert.latest_wins(df, ["k"], ["version", "uid"]).collect()
    assert len(row) == 1 and row[0]["payload"] == "b"  # ties broken by uid


def test_delete_insert_upsert(spark):
    old = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    new = spark.createDataFrame([(2, "y2"), (3, "z")], "k long, v string")
    out = {
        r["k"]: r["v"]
        for r in upsert.delete_insert_upsert(old, new, ["k"]).collect()
    }
    assert out == {1: "x", 2: "y2", 3: "z"}


# --- jsonstat -------------------------------------------------------------

DENSE = {
    "id": ["geo", "time"],
    "size": [2, 2],
    "dimension": {
        "geo": {
            "category": {
                "index": {"DE": 0, "FR": 1},
                "label": {"DE": "Germany"},  # FR falls back to id
            }
        },
        "time": {"category": {"index": {"2020": 0, "2021": 1}}},
    },
    "value": [1.0, None, 3.0, 4.0],
}


def test_jsonstat_dense_decode():
    rows = list(jsonstat.decode_jsonstat(DENSE))
    assert rows == [
        ({"time": "2020", "geo": "Germany"}, 1.0),
        ({"time": "2020", "geo": "FR"}, 3.0),
        ({"time": "2021", "geo": "FR"}, 4.0),
    ]


def test_jsonstat_sparse_and_malformed():
    sparse = {
        "id": ["s"],
        "size": [3],
        "dimension": {
            "s": {"category": {"index": {"a": 0, "b": "oops", "c": 2}}}
        },
        "value": {"2": 9.0, "x": 1.0, "7": 2.0},  # bad key + out of range
    }
    rows = list(jsonstat.decode_jsonstat(sparse))
    assert rows == [({"s": "c"}, 9.0)]
    # list-form index is accepted
    listform = {
        "id": ["s"],
        "size": [2],
        "dimension": {"s": {"category": {"index": ["p", "q"]}}},
        "value": [5.0, 6.0],
    }
    assert list(jsonstat.decode_jsonstat(listform)) == [
        ({"s": "p"}, 5.0),
        ({"s": "q"}, 6.0),
    ]


def test_jsonstat_spark_variants_agree(spark):
    import json

    df = spark.createDataFrame(
        [("r1", json.dumps(DENSE))], ["record_id", "payload"]
    )

    def norm(frame):
        return sorted(
            (r["record_id"], tuple(sorted(r["dims"].items())), r["value"])
            for r in frame.collect()
        )

    assert norm(jsonstat.flatten_jsonstat(df)) == norm(
        jsonstat.flatten_jsonstat_spark(df)
    )


# --- dedup / similarity ---------------------------------------------------


def test_minhash_lsh_finds_synthetic_neardups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the spark engine shuffles partitions across the cluster"
    )
    near = base.replace("lazy", "sleepy")  # high jaccard
    other = "completely different words in this unrelated document here"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = dedup_ops.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5
    ).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard_raw"] > 0.7


def test_lsh_mega_bucket_cap_bounds_fanout_and_keeps_components(spark):
    """The mega-cluster fan-out cap: a boilerplate cluster of N mutual
    near-dups must emit O(N) star candidates, not O(N^2) pairs, while
    the resulting connected component is IDENTICAL to the uncapped
    run's (every member is near-dup to the hub, so the star keeps the
    cluster connected); pairs among normal documents are untouched."""
    from elt_data4transformation_spark.plans.dedup import (
        _min_label_components,
    )

    boiler = (
        "this website uses cookies to improve your experience please "
        "accept our cookie policy to continue browsing the site today"
    )
    n_mega = 60
    rows = [
        # near-identical boilerplate: vary one trailing token so docs
        # are near- (not exact-) dups, all mutually jaccard >= 0.5
        (i, boiler + f" v{i % 3}")
        for i in range(n_mega)
    ]
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the spark engine shuffles partitions across the cluster"
    )
    rows += [(1000, base), (1001, base.replace("lazy", "sleepy"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup_ops.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket=16
    )
    uncapped = dedup_ops.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5
    )
    n_capped = capped.count()
    n_uncapped = uncapped.count()
    # fan-out bound: uncapped is quadratic in the mega cluster
    # (~n_mega^2/2 pairs), capped is linear (star = n_mega-1 per band
    # + the normal pair)
    assert n_uncapped > n_mega * (n_mega - 1) / 4
    assert n_capped <= 2 * n_mega + 5
    # the normal near-dup pair survives the cap untouched
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (1000, 1001) in capped_pairs
    # recall: components are IDENTICAL — the star keeps the mega
    # cluster connected through the hub
    comp_c = {
        (r["doc_id"], r["component"])
        for r in _min_label_components(
            capped.select("doc_a", "doc_b")
        ).collect()
    }
    comp_u = {
        (r["doc_id"], r["component"])
        for r in _min_label_components(
            uncapped.select("doc_a", "doc_b")
        ).collect()
    }
    assert comp_c == comp_u
    mega_members = {d for d, c in comp_c if c == 0}
    assert mega_members == set(range(n_mega))


def test_stored_band_index_probe_never_rereads_corpus(spark, tmp_path):
    """Two-invocation stored-index dedup: invocation 1 builds the
    parquet band+shingle index from the corpus; invocation 2 probes a
    new batch against the STORED artifacts. The corpus parquet is
    DELETED between the two — if the probe re-shingled (or even
    re-read) the corpus it would fail; instead it matches purely from
    the stored index, which is the delta-proportional production
    shape."""
    import shutil

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the spark engine shuffles partitions across the cluster"
    )
    corpus_rows = [
        (1, base),
        (2, "completely different words in this unrelated document here "
            "nothing shared with any other text in the little corpus"),
        (3, base.replace("quick", "rapid").replace("dog", "hound")),
    ]
    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        corpus_rows, "doc_id long, text string"
    ).write.parquet(corpus_path)

    # invocation 1: build + store the index from the corpus file
    idx_path = str(tmp_path / "idx")
    dedup_ops.write_band_index(
        spark.read.parquet(corpus_path), idx_path
    )

    # corpus gone: only the stored artifacts remain
    shutil.rmtree(corpus_path)

    # invocation 2: probe a new batch — near-dup of doc 1 + one novel
    delta = spark.createDataFrame(
        [
            (100, base.replace("lazy", "sleepy")),
            (101, "entirely novel content with no duplicate anywhere "
                  "in the stored corpus at all whatsoever believe me"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["new_doc_id"], r["matched_doc_id"]): r["jaccard_raw"]
        for r in dedup_ops.probe_band_index(
            spark, idx_path, delta, threshold=0.5
        ).collect()
    }
    assert set(out) == {(100, 1)}
    assert out[(100, 1)] > 0.7

    # oversize-delta declaration: past BROADCAST_DELTA_MAX_DOCS the
    # probe drops its broadcast hints (shuffle-join fallback, no 8 GB
    # ceiling) but must return the identical rows and scores
    fallback = {
        (r["new_doc_id"], r["matched_doc_id"]): r["jaccard_raw"]
        for r in dedup_ops.probe_band_index(
            spark, idx_path, delta, threshold=0.5,
            delta_rows=dedup_ops.BROADCAST_DELTA_MAX_DOCS + 1,
        ).collect()
    }
    assert fallback == out


def test_stored_artifact_queries_reuse_index_across_invocations(spark):
    """The stored-artifact family (dedup_stored_index, ann_stored_ivf,
    cdc_stored_state_maintain): invocation 2 must (a) return identical
    rows and (b) REUSE the artifact — same files, same mtimes — not
    rebuild it."""
    import os

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.dedup import _index_root
    from tests.conftest import SF_SMALL

    roots = {
        "dedup_stored_index": _index_root(),
        "ann_stored_ivf": os.path.join(
            os.path.dirname(_index_root()), "ann_ivf"
        ),
        "cdc_stored_state_maintain": os.path.join(
            os.path.dirname(_index_root()), "cdc_state"
        ),
        "cdc_state_advance": os.path.join(
            os.path.dirname(_index_root()), "cdc_advance"
        ),
        "ann_ivf_maintain": os.path.join(
            os.path.dirname(_index_root()), "ann_ivf_maintain"
        ),
        "dedup_index_maintain": f"{_index_root()}_maintain",
    }

    def snapshot(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
        return out

    for name, root in roots.items():
        fn = REGISTRY[name].fn
        first = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
        spark.catalog.clearCache()
        before = snapshot(root)
        assert before, f"{name}: no artifact written under {root}"
        second = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
        assert first == second, f"{name}: rows changed across invocations"
        assert snapshot(root) == before, (
            f"{name}: artifact was rebuilt instead of reused"
        )


def test_jaccard_pairs_sparse_join(spark):
    sets = spark.createDataFrame(
        [
            (1, ["a", "b", "c"], "g"),
            (2, ["b", "c", "d"], "g"),
            (3, ["x", "y"], "g"),
            (4, ["a", "b", "c"], "h"),  # other block: never paired with 1
        ],
        "id long, s array<string>, blk string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in dedup_ops.jaccard_pairs(sets, "id", "s", "blk").collect()
    }
    assert out == {(1, 2): 0.5}  # |{b,c}| / |{a,b,c,d}|


def test_jaccard_pairs_hot_token_df_cap(spark):
    """The inverted-index hot-token cap: a token present in every doc
    is dropped from candidate generation (bounding join fan-out), but
    candidates that remain re-score EXACTLY on their full sets — the
    hot token still counts toward their intersection. Pairs sharing
    ONLY the hot token disappear (the declared recall cost)."""
    sets = spark.createDataFrame(
        [
            (1, ["hot", "a", "b", "c"]),
            (2, ["hot", "a", "b", "d"]),
            (3, ["hot", "x", "y", "z"]),  # shares only 'hot' with 1/2
            (4, ["hot", "x", "y", "w"]),
        ],
        "id long, s array<string>",
    )
    uncapped = {
        (r["doc_a"], r["doc_b"]): (r["jac"], r["inter_size"])
        for r in dedup_ops.jaccard_pairs(sets, "id", "s").collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): (r["jac"], r["inter_size"])
        for r in dedup_ops.jaccard_pairs(sets, "id", "s", max_df=3).collect()
    }
    # 'hot' has df 4 > 3 -> dropped from candidate generation: the
    # only-hot pairs (1,3),(1,4),(2,3),(2,4) vanish
    assert set(uncapped) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert set(capped) == {(1, 2), (3, 4)}
    # surviving candidates re-score on FULL sets: intersection still
    # includes the hot token, so jac is identical to the uncapped run
    assert capped[(1, 2)] == uncapped[(1, 2)]
    assert capped[(1, 2)][1] == 3  # {hot, a, b}
    assert capped[(3, 4)] == uncapped[(3, 4)]


def test_cosine_pairs_blocked(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9999, 0.01, 0.0]),
        (5000, [1.0, 0.001, 0.0]),  # different block than 0/1
        (7, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in vectors.cosine_pairs(
            df, "vec_id", "v", threshold=0.99, block_size=1024
        ).collect()
    }
    # cross-block pair (0,5000) and (1,5000) must be found too
    assert (0, 1) in pairs and (0, 5000) in pairs and (1, 5000) in pairs
    assert all(a < b for a, b in pairs)
    assert not any(7 in p for p in pairs)


def test_simhash_close_for_similar_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", T.simhash_col(F.split("text", " ")).alias("sh")
        ).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert ham(out[1], out[2]) < ham(out[1], out[3])
    assert len(out[1]) == 32 and set(out[1]) <= {"0", "1"}


# --- multimodal -----------------------------------------------------------


def test_multimodal_decode_stub(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = multimodal.decode_features(
        multimodal.with_binary_payload(df, "doc_id", "text")
    ).collect()[0]
    assert out["n_bytes"] == 11
    assert out["header_hex"] == "68656c6c"
    assert out["mime"] == "text/plain"
    assert out["fake_width"] == 64 + (11 % 64) * 16
    # PNG and JPEG decode are REAL (stdlib codecs); remaining mimes
    # (real video containers / compressed audio) stay gated
    with pytest.raises(NotImplementedError):
        multimodal._decode_real(b"x", "video/mp4")
    with pytest.raises(ValueError):  # PNG route rejects non-PNG bytes
        multimodal._decode_real(b"x", "image/png")
    with pytest.raises(ValueError):  # JPEG route rejects non-JPEG bytes
        multimodal._decode_real(b"x", "image/jpeg")
    from elt_data4transformation_spark.operators import pngcodec

    feats = multimodal._decode_real(
        pngcodec.write_png(2, 1, bytes([10, 20, 30, 40, 60, 80])),
        "image/png",
    )
    assert (feats["width"], feats["height"]) == (2, 1)
    assert feats["mean_r"] == 25.0 and feats["mean_b"] == 55.0


# --- pg_trgm parity + greedy clustering (T5 / T9) -------------------------


def test_pg_trgm_matches_postgres_semantics(spark):
    # pg_trgm('cat'): {'  c',' ca','cat','at '} — two leading spaces,
    # one trailing, lowercased, distinct.
    df = spark.createDataFrame([("Cat cat",)], "t string")
    out = df.select(T.pg_trgm_col(F.col("t")).alias("g")).collect()[0]["g"]
    assert sorted(out) == sorted(["  c", " ca", "cat", "at "])


def test_pg_trgm_similarity_boundary(spark):
    # similarity('word','word') = 1.0; disjoint strings -> 0 overlap
    df = spark.createDataFrame([("word", "word", "zzzz")], "a string, b string, c string")
    ga = T.pg_trgm_col(F.col("a"))
    gb = T.pg_trgm_col(F.col("b"))
    gc = T.pg_trgm_col(F.col("c"))
    row = df.select(
        F.size(F.array_intersect(ga, gb)).alias("ab"),
        F.size(ga).alias("na"),
        F.size(F.array_intersect(ga, gc)).alias("ac"),
    ).collect()[0]
    assert row["ab"] == row["na"]  # identical strings share every trigram
    assert row["ac"] == 0


def test_greedy_cluster_order_dependence():
    # First-cluster-wins, in input order: c joins cluster of a (via b),
    # even though c is also similar to d — reference clustering.py:224-255.
    from elt_data4transformation_spark.plans.cluster import (
        _CLUSTER_THRESHOLD,
        _jaccard,
    )

    assert _CLUSTER_THRESHOLD == 0.5
    a = frozenset({"w1", "w2", "w3", "w4"})
    b = frozenset({"w1", "w2", "w3", "w5"})
    assert _jaccard(a, b) == pytest.approx(3 / 5)
    assert _jaccard(a, frozenset()) == 0.0
    assert _jaccard(a, a) == 1.0


def test_dq_report_detects_each_check_kind(spark):
    """The declarative DQ runner on a constructed fixture: every check
    kind (not_null, accepted_range numeric + date, unique,
    unique_combination) finds exactly the planted violations, and the
    sample is the min offending primary key."""
    from elt_data4transformation_spark.operators.dq import (
        DQCheck,
        dq_report,
    )

    t = spark.createDataFrame(
        [
            (1, 10, 5.0, "2020-01-05", "a"),
            (2, 10, 150.0, "2020-01-06", "a"),  # dup grp; range high
            (3, None, -1.0, "2019-12-30", "b"),  # null; range low; date low
            (4, 30, 50.0, "2020-01-07", "b"),
            (5, 30, 50.0, "2020-01-07", "b"),  # dup (grp, tag) combo
        ],
        "pk long, grp int, val double, d string, tag string",
    ).withColumn("d", F.col("d").cast("date"))
    parent = spark.createDataFrame([(10,), (30,)], "gid int")
    checks = (
        DQCheck("t", "not_null", ("grp",)),
        DQCheck("t", "accepted_range", ("val",), lo=0, hi=100),
        DQCheck(
            "t", "accepted_range", ("d",), lo="2020-01-01", hi="2020-12-31"
        ),
        DQCheck("t", "unique", ("pk",)),
        DQCheck("t", "unique", ("grp",)),
        DQCheck("t", "unique_combination", ("grp", "tag")),
        # NULL tag would pass accepted_values (dbt semantics); 'b' fails
        DQCheck("t", "accepted_values", ("tag",), values=("a", "c")),
        # grp NULL is skipped; all non-NULL grp values exist in parent
        DQCheck(
            "t", "relationships", ("grp",), to_table="p", to_column="gid"
        ),
        # and against a parent missing 30: rows 4,5 are orphans
        DQCheck(
            "t", "relationships", ("grp",), to_table="p10", to_column="gid"
        ),
    )
    rows = {
        (r["check_name"], r["columns"]): (r["n_violations"], r["sample"])
        for r in dq_report(
            {"t": t, "p": parent, "p10": parent.filter("gid = 10")},
            {"t": "pk"},
            checks,
        ).collect()
    }
    assert rows[("not_null", "grp")] == (1, "3")
    assert rows[("accepted_range", "val")] == (2, "2")
    assert rows[("accepted_range", "d")] == (1, "3")
    assert rows[("unique", "pk")] == (0, None)
    assert rows[("unique", "grp")] == (2, "10")  # two duplicated keys
    # both (10,a) and (30,b) combos are duplicated; min sample wins
    assert rows[("unique_combination", "grp+tag")] == (2, "10|a")
    assert rows[("accepted_values", "tag")] == (3, "3")  # the 'b' rows
    assert rows[("relationships", "grp->p.gid")] == (0, None)
    assert rows[("relationships", "grp->p10.gid")] == (2, "4")


def test_greedy_cluster_ceiling_enforced(spark, monkeypatch):
    # The driver-side collect has a HARD guard, not just a documented
    # ceiling: under the bound the query runs; above it, it raises and
    # points at the distributed dedup_components path.
    from elt_data4transformation_spark.plans import cluster as cl
    from tests.conftest import SF_SMALL

    out = cl.greedy_cluster(spark, SF_SMALL)
    assert out.count() > 0  # under the ceiling: normal operation

    # round-9 tightening: the O(N*C) sequential loop, not memory, is
    # the binding constraint — the ceiling must stay interactive-sized
    assert cl.GREEDY_MAX_ROWS == 20_000

    monkeypatch.setattr(cl, "GREEDY_MAX_ROWS", 1)
    with pytest.raises(ValueError, match="dedup_components"):
        cl.greedy_cluster(spark, SF_SMALL)


# --- export sink (S25) + identifier guard (P7) ----------------------------


def test_validate_identifier():
    from elt_data4transformation_spark.sources.export import validate_identifier

    assert validate_identifier("findings_v2") == "findings_v2"
    for bad in ("1abc", "a-b", "a b", "a;drop", "", "päyload"):
        with pytest.raises(ValueError):
            validate_identifier(bad)


def test_export_dataset_csv_and_manifest(spark, tmp_path):
    import json as _json

    from elt_data4transformation_spark.sources.export import export_dataset

    df = spark.createDataFrame(
        [(1, ["a", "b"], "x"), (2, [], "y")],
        "id long, topics array<string>, note string",
    )
    manifest = export_dataset({"findings": df}, str(tmp_path))
    assert manifest["tables"]["findings"]["row_count"] == 2
    back = (
        spark.read.option("header", True)
        .csv(str(tmp_path / "findings"))
        .orderBy("id")
        .collect()
    )
    assert back[0]["topics"] == "a|b"  # '|'-joined list cell
    on_disk = _json.loads((tmp_path / "manifest.json").read_text())
    assert on_disk["tables"]["findings"]["columns"] == ["id", "topics", "note"]
    with pytest.raises(ValueError):
        export_dataset({"bad name": df}, str(tmp_path))


def test_jsonstat_status_decode():
    from elt_data4transformation_spark.operators.jsonstat import (
        decode_jsonstat_status,
    )

    doc = {
        "id": ["g"],
        "size": [3],
        "dimension": {"g": {"category": {"index": {"a": 0, "b": 1, "c": 2}}}},
        "value": [1.0, None, 3.0],
        "status": {"0": "p"},
    }
    pts = list(decode_jsonstat_status(doc))
    assert pts == [({"g": "a"}, 1.0, "p"), ({"g": "c"}, 3.0, None)]


# --- connector primitives (S13/S14/S26) -----------------------------------


def test_paginate_stops_on_short_page():
    from elt_data4transformation_spark.sources.connectors import paginate

    pages = {1: [{"i": 0}, {"i": 1}], 2: [{"i": 2}, {"i": 3}], 3: [{"i": 4}]}
    calls = []

    def fetch(page, per_page):
        calls.append(page)
        return pages.get(page, [])

    rows = list(paginate(fetch, per_page=2))
    assert [r["i"] for r in rows] == [0, 1, 2, 3, 4]
    assert calls == [1, 2, 3]  # stops after the short page, no page 4


def test_rate_limiter_sliding_window():
    from elt_data4transformation_spark.sources.connectors import (
        SlidingWindowRateLimiter,
    )

    rl = SlidingWindowRateLimiter(max_requests=2, window_s=60.0)
    assert rl.wait_time(0.0) == 0.0
    rl.record(0.0)
    rl.record(1.0)
    assert rl.wait_time(2.0) == pytest.approx(58.0)  # oldest at 0 expires at 60
    assert rl.wait_time(61.0) == 0.0  # window slid


def test_backoff_policy_bounds():
    from elt_data4transformation_spark.sources.connectors import backoff_delays

    assert backoff_delays(3, base_s=10.0, cap_s=30.0) == [10.0, 20.0, 30.0]
    # honoured Retry-After capped at 120 s (reference once stalled hours)
    assert backoff_delays(3, retry_after_s=7200.0)[0] == 120.0


def test_retry_after_parse_forms():
    """ADVICE round-7 fix: both RFC-7231 Retry-After forms parse;
    garbage returns None (caller falls back to exponential backoff)
    instead of raising ValueError mid-fetch."""
    import email.utils
    import time

    from elt_data4transformation_spark.sources.connectors import (
        parse_retry_after,
    )

    assert parse_retry_after("7") == 7.0
    assert parse_retry_after(None) is None
    assert parse_retry_after("not-a-delay") is None
    # HTTP-date in the past clamps to 0 (retry now), never negative
    assert parse_retry_after("Wed, 21 Oct 2015 07:28:00 GMT") == 0.0
    future = email.utils.formatdate(time.time() + 50, usegmt=True)
    assert 40.0 <= parse_retry_after(future) <= 51.0


def test_retry_after_honoured_on_later_attempts():
    """ADVICE round-7 fix: Retry-After must govern the sleep on
    WHICHEVER attempt it arrives (the old schedule only wrote it into
    delays[0]), and an unparseable header falls back to the
    exponential delay for that attempt."""
    import io
    import urllib.error

    from elt_data4transformation_spark.sources.connectors import (
        FetchError,
        HttpFetcher,
    )

    def run(headers_by_attempt):
        sleeps: list[float] = []
        f = HttpFetcher(
            "http://fixture",
            max_retries=2,
            retry_base_s=1.0,
            clock=lambda: 0.0,
            sleep=sleeps.append,
        )
        attempts = iter(headers_by_attempt)

        def fail_open(url, headers, data=None):
            raise urllib.error.HTTPError(
                url, 503, "busy", next(attempts), io.BytesIO(b"")
            )

        f._open = fail_open
        with pytest.raises(FetchError):
            f.request_json("api/x")
        return sleeps

    # header only on the SECOND failure: attempt 0 sleeps exponential
    # 1.0, attempt 1 sleeps the header's 9.0 (old code slept 2.0)
    assert run([{}, {"Retry-After": "9"}, {}]) == [1.0, 9.0]
    # unparseable header -> exponential fallback, not a crash
    assert run([{"Retry-After": "soon"}, {}, {}]) == [1.0, 2.0]
    # header capped at retry_after_cap_s
    assert run([{"Retry-After": "7200"}, {}, {}]) == [120.0, 2.0]


def test_conditional_get_cache():
    from elt_data4transformation_spark.sources.connectors import (
        ConditionalGetCache,
    )

    c = ConditionalGetCache()
    assert c.headers_for("u") == {}
    c.update("u", etag='W/"abc"', last_modified="Mon, 01 Jan 2024 00:00:00 GMT")
    assert c.headers_for("u") == {
        "If-None-Match": 'W/"abc"',
        "If-Modified-Since": "Mon, 01 Jan 2024 00:00:00 GMT",
    }
    assert c.is_fresh("u", 304) and not c.is_fresh("u", 200)
    assert not c.is_fresh("unknown", 304)


# --- concept vectors (T7/T8) ---------------------------------------------


def test_question_vector_reference_examples():
    """The tuned thresholds documented in clustering.py:33-37, 95-101."""
    from math import sqrt

    from elt_data4transformation_spark.functions import concepts as C

    def cos(a, b):
        va, vb = C.question_vector(a), C.question_vector(b)
        dot = sum(w * vb.get(t, 0.0) for t, w in va.items())
        na = sqrt(sum(w * w for w in va.values()))
        nb = sqrt(sum(w * w for w in vb.values()))
        return dot / (na * nb)

    # DE/EN reversal pair clusters (>= 0.72)
    assert cos("Atomausstieg rückgängig machen", "return to nuclear power") >= 0.72
    # same-topic different questions must NOT merge (< 0.72)
    assert cos("stricter climate laws", "EU climate priority") < 0.72
    # polarity guard: keep vs phase-out stays below threshold
    assert cos("Keep nuclear power", "Phase out nuclear power") < 0.72


def test_doc_terms_spark_matches_python(spark):
    from elt_data4transformation_spark.functions import concepts as C

    rows = [
        (1, "Klimaschutzgesetz jetzt"),
        (2, "stricter climate laws"),
        (3, "the a of and"),  # all stopwords/short -> empty vector
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id"], r["term"]): r["w"]
        for r in C.doc_terms(spark, df).collect()
    }
    for i, text in rows:
        for term, w in C.question_vector(text).items():
            assert got.get((i, term)) == w, (i, term)
    assert not [k for k in got if k[0] == 3]


# --- pdf resolver (S24) ---------------------------------------------------


def test_pdf_resolver_strategy_order(spark):
    from elt_data4transformation_spark.plans import REGISTRY

    out = {
        r["doc_id"]: r["pdf_url"]
        for r in REGISTRY["pdf_resolve"].fn(spark, "/root/testdata/sf0.001")
        .limit(50)
        .collect()
    }
    # variant 0: meta citation_pdf_url wins over the decoy anchor,
    # root-relative resolves against the origin
    assert out[0] == "https://journals.example.org/meta/0.pdf"
    # variant 1: bitstream (+5) beats the deprioritized anhang link
    assert out[1] == "https://journals.example.org/item/1/bitstream/doc1.pdf"
    # variant 2: volltext (+3) beats appendix (-4)
    assert out[2] == "https://journals.example.org/item/2/dl/volltext2.pdf"
    # variant 3: absolute URL with query string kept as-is
    assert out[3] == "https://cdn.example.org/f/3.pdf?download=1"
    # variant 4: no PDF -> null
    assert out[4] is None


# --- OAI-PMH decode (S19) --------------------------------------------------


def test_oai_decode_skips_deleted_and_finds_doi():
    from elt_data4transformation_spark.operators.oai import decode_oai

    xml = """<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/"><ListRecords>
      <record><header status="deleted"><identifier>oai:x:1</identifier></header></record>
      <record><header><identifier>oai:x:2</identifier></header><metadata>
        <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
                   xmlns:dc="http://purl.org/dc/elements/1.1/">
          <dc:title>T</dc:title>
          <dc:identifier>ssoar-123</dc:identifier>
          <dc:identifier>https://h.example/2</dc:identifier>
          <dc:identifier>doi:10.5/x</dc:identifier>
          <dc:language>GER</dc:language>
        </oai_dc:dc></metadata></record>
      </ListRecords><resumptionToken>tk</resumptionToken></OAI-PMH>"""
    rows = list(decode_oai(xml))
    assert len(rows) == 1  # deleted record skipped
    r = rows[0]
    assert r["external_id"] == "oai:x:2"
    assert r["canonical_url"] == "https://h.example/2"  # first http id
    assert r["doi"] == "doi:10.5/x"
    assert r["language"] == "de"  # GER -> de, case-folded
    assert r["resumption_token"] == "tk"
    assert list(decode_oai("not xml <")) == []


# --- T1 claim extraction (reference test_claims_german_pct.py ported) ------


def _extract_claims(spark, text):
    from elt_data4transformation_spark.functions.claims import claims_from_text_df

    src = spark.createDataFrame([("s", text)], "study_id string, text string")
    return [
        (r.value_num, r.unit, r.snippet)
        for r in claims_from_text_df(src).collect()
    ]


def _vals(spark, text, unit=None):
    return [
        v for v, u, _ in _extract_claims(spark, text) if unit is None or u == unit
    ]


def test_claims_prozent_word_is_captured(spark):
    assert 62.0 in _vals(
        spark, "62 Prozent der Befragten befürworten das Gesetz.", "%"
    )


def test_claims_prozent_no_space(spark):
    assert 47.0 in _vals(spark, "Zustimmung lag bei 47Prozent.", "%")


def test_claims_v_h_abbreviation(spark):
    assert 55.0 in _vals(spark, "55 v.H. der Wähler lehnen dies ab.", "%")


def test_claims_vom_hundert(spark):
    assert 30.0 in _vals(spark, "Rund 30 vom Hundert sind unentschieden.", "%")


def test_claims_percent_sign_all_matches(spark):
    vals = _vals(spark, "62% Zustimmung, 36 % Ablehnung.", "%")
    assert 62.0 in vals and 36.0 in vals


def test_claims_prozentpunkte_tagged_pp_not_percent(spark):
    out = _extract_claims(
        spark, "Die Union verliert 3 Prozentpunkte gegenüber Vormonat."
    )
    assert any(v == 3.0 and u == "pp" for v, u, _ in out)
    assert not any(v == 3.0 and u == "%" for v, u, _ in out)


def test_claims_decimal_comma(spark):
    assert 62.5 in _vals(spark, "62,5 Prozent Zustimmung.", "%")


def test_claims_german_thousands_sample(spark):
    assert 6063.0 in _vals(spark, "Befragt wurden n=6.063 Personen.", "n")


def test_claims_over_120_suppressed(spark):
    assert 250.0 not in _vals(spark, "Die Zahl stieg um 250 Prozent.", "%")


def test_claims_case_insensitive(spark):
    assert 41.0 in _vals(spark, "41 PROZENT stimmen zu.", "%")


def test_claims_snippet_matches_reference_trim(spark):
    # _trim_snippet parity: word-boundary back-off left, delimiter stop right
    text = (
        "Einleitungssatz über die Methodik der Umfrage im Detail. "
        "Die Zustimmung lag bei 62,5 Prozent der Befragten, was eine "
        "deutliche Mehrheit darstellt und die Debatte veränderte."
    )
    out = _extract_claims(spark, text)
    [(v, u, snippet)] = [r for r in out if r[1] == "%"]
    assert v == 62.5
    import re as _re

    lo = max(0, text.index("62,5") - 90)
    while lo > 0 and text[lo] != " ":
        lo -= 1
    hi = min(len(text), text.index("62,5") + len("62,5 Prozent") + 90)
    while hi < len(text) and text[hi] not in " .;!?":
        hi += 1
    assert snippet == _re.sub(r"\s+", " ", text[lo:hi].strip())


def test_claims_multiline_whitespace(spark):
    # \s* between value and unit: newline / double-space don't break it
    assert 62.0 in _vals(spark, "Zustimmung:\n62\n Prozent insgesamt.", "%")


def test_claims_per_span_dedup_keeps_repeats(spark):
    # same value at two positions = two claims (span is part of the key)
    vals = _vals(spark, "62 % hier und 62 % dort.", "%")
    assert vals.count(62.0) == 2


# --- ANN IVF recall (k-means-refined buckets) ------------------------------


def test_ann_ivf_recall_vs_bruteforce(spark):
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].fn(spark, SF_SMALL).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_topk"].fn(spark, SF_SMALL).collect()
    }
    recall = len(bf & ivf) / len(bf)
    # one Lloyd iteration over the seeded centroids: 0.88 measured;
    # gate well below to stay robust to fixture regeneration
    assert recall >= 0.8, f"IVF recall {recall} dropped below 0.8"


def test_ann_ivf_scaled_k_rule_and_recall(spark):
    """ann_ivf_scaled: the emitted k column IS ceil(sqrt(N)) of the
    corpus (the executable K rule, round-9), and scaled-K recall vs
    brute force stays usable — more, narrower buckets trade recall for
    the sqrt(N) per-probe bound, so the gate sits below the fixed-K
    one."""
    import math

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.sources import table
    from tests.conftest import SF_SMALL

    rows = REGISTRY["ann_ivf_scaled"].fn(spark, SF_SMALL).collect()
    n = table(spark, SF_SMALL, "embeddings").count()
    assert {r.k for r in rows} == {math.ceil(math.sqrt(n))}
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].fn(spark, SF_SMALL).collect()
    }
    scaled = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(bf & scaled) / len(bf)
    # measured at sf0.001 (N=500, K=23): narrower buckets than K=16;
    # gate loose for fixture regeneration
    assert recall >= 0.5, f"scaled-K recall {recall} below 0.5"


# --- foreachBatch snapshot diff: multi-micro-batch correctness -------------


def test_foreach_batch_diff_multibatch_matches_singlebatch(spark, tmp_path):
    # split events into 4 files; maxFilesPerTrigger=1 forces 4 micro-
    # batches — per-key (sum, count) must accumulate ACROSS batches so
    # the result is identical to the single-batch run
    from elt_data4transformation_spark.streaming.events import (
        foreach_batch_snapshot_diff,
    )

    src = str(tmp_path / "multi")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # keep ts at its on-disk physical type so the stream-side schema
    # probe sees the same shape as the original file
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(4)
        .write.parquet(src)
    )
    single = {
        (r.event_type, r.prev_avg, r.cur_avg, r.status)
        for r in foreach_batch_snapshot_diff(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    multi = {
        (r.event_type, r.prev_avg, r.cur_avg, r.status)
        for r in foreach_batch_snapshot_diff(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert multi == single


# --- T1 claim extraction (reference test_claims.py TestExtractor ported) ---


def test_claims_space_and_decimal_both_captured(spark):
    vals = sorted(
        _vals(spark, "62,5 % der Befragten und 67 % der Personen unter 30", "%")
    )
    assert vals == [62.5, 67.0]


def test_claims_sample_in_parens(spark):
    assert 1009.0 in _vals(
        spark, "Repräsentative Umfrage (n=1009, Wahlberechtigte) im Jahr 2024.", "n"
    )


def test_claims_implausible_mixed_with_plausible(spark):
    vals = sorted(
        _vals(spark, "Marktwachstum 200% im Jahr 2024, Zustimmung 55%", "%")
    )
    assert vals == [55.0]


def test_claims_empty_and_no_match(spark):
    assert _extract_claims(spark, "") == []
    assert _extract_claims(
        spark, "Eine qualitative Diskursanalyse ohne Zahlen."
    ) == []


def test_claims_id_stable(spark):
    from elt_data4transformation_spark.functions.claims import claims_from_text_df

    def ids(text):
        src = spark.createDataFrame([("s", text)], "study_id string, text string")
        return [r.claim_id for r in claims_from_text_df(src).collect()]

    assert ids("62% support.") == ids("62% support.")


def test_claims_value_parsing_reference_table(spark):
    from elt_data4transformation_spark.functions.claims import (
        claim_value_col,
        claim_value_sql,
    )
    import duckdb
    from pyspark.sql import functions as F

    cases = [
        ("62", 62.0),
        ("62.5", 62.5),
        ("62,5", 62.5),
        ("6,063", 6063.0),  # german thousands
        ("6.063", 6063.0),  # european thousands
        ("not a number", None),
        ("1.234.567", None),  # multi-dot: reference float() fails -> None
    ]
    src = spark.createDataFrame([(t,) for t, _ in cases], "tok string")
    got = [r.v for r in src.select(claim_value_col(F.col("tok")).alias("v")).collect()]
    assert got == [e for _, e in cases]
    con = duckdb.connect()
    for tok, exp in cases:
        (sql_val,) = con.execute(
            "SELECT " + claim_value_sql(f"'{tok}'")
        ).fetchone()
        assert sql_val == exp, (tok, sql_val, exp)


# --- as-of join semantics (boundary cases) ---------------------------------


def test_asof_union_window_pattern_boundaries(spark):
    # the exact pattern asof_join_rates uses: rates sort before events
    # at equal ts, last(rate, ignorenulls) carries forward
    from pyspark.sql import Window

    rates = spark.createDataFrame(
        [("k", "2024-01-05 00:00:00", 1.0), ("k", "2024-01-10 00:00:00", 2.0)],
        "key string, ts string, rate double",
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "rate",
             F.lit(1).alias("is_rate"), F.lit(None).cast("long").alias("eid"))
    events = spark.createDataFrame(
        [
            (1, "k", "2024-01-04 23:59:59"),  # before first rate -> NULL
            (2, "k", "2024-01-05 00:00:00"),  # exactly at -> 1.0 (<=)
            (3, "k", "2024-01-07 12:00:00"),  # between -> 1.0
            (4, "k", "2024-01-10 00:00:00"),  # exactly at second -> 2.0
            (5, "k", "2024-01-31 00:00:00"),  # after last -> 2.0
        ],
        "eid long, key string, ts string",
    ).select("key", F.col("ts").cast("timestamp").alias("ts"),
             F.lit(None).cast("double").alias("rate"),
             F.lit(0).alias("is_rate"), "eid")
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts"), F.col("is_rate").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = {
        r["eid"]: r["eff"]
        for r in rates.unionByName(events)
        .withColumn("eff", F.last("rate", ignorenulls=True).over(w))
        .filter(F.col("is_rate") == 0)
        .collect()
    }
    assert out == {1: None, 2: 1.0, 3: 1.0, 4: 2.0, 5: 2.0}


def test_embedding_quantize_bounds(spark):
    # |q| <= 127 always; rmse <= scale/2 (max rounding error per dim)
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["embedding_quantize"].fn(spark, SF_SMALL).collect()
    assert rows, "no vectors"
    for r in rows:
        assert r["n_saturated"] >= 0
        assert r["rmse"] <= r["scale"] / 2 + 1e-9, r


def test_dedup_components_properties(spark):
    # Min-label fixpoint invariants: (a) each component is labeled by its
    # smallest member, (b) both endpoints of every near-dup edge land in
    # the same component, (c) component_size matches the group count.
    from elt_data4transformation_spark.operators import dedup_ops
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.dedup import (
        N_BANDS,
        N_MINHASH,
        SHINGLE,
    )
    from elt_data4transformation_spark.sources import spread, table
    from tests.conftest import SF_SMALL

    rows = REGISTRY["dedup_components"].fn(spark, SF_SMALL).collect()
    assert rows, "no components"
    comp = {r["doc_id"]: r["component"] for r in rows}
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for label, members in by_comp.items():
        assert min(m["doc_id"] for m in members) == label
        assert all(m["component_size"] == len(members) for m in members)
    edges = dedup_ops.minhash_lsh_pairs(
        spread(table(spark, SF_SMALL, "documents")),
        id_col="doc_id",
        text_col="text",
        shingle=SHINGLE,
        n_hashes=N_MINHASH,
        n_bands=N_BANDS,
        threshold=0.5,
    ).select("doc_a", "doc_b").collect()
    assert edges, "no near-dup edges at this SF"
    for e in edges:
        assert comp[e["doc_a"]] == comp[e["doc_b"]], e


def test_bm25_score_differential(spark):
    # Recompute BM25 driver-side from the raw corpus and compare exactly
    # (same rounding) — independent of both the Spark plan and the oracle.
    import math

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.semantic import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )
    from elt_data4transformation_spark.sources import spread, table
    from tests.conftest import SF_SMALL

    docs = (
        spread(table(spark, SF_SMALL, "documents"))
        .select("doc_id", "text")
        .collect()
    )
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n_docs
    tf = {
        d: [w.count(t) for t in _BM25_TERMS] for d, w in toks.items()
    }
    df = [
        sum(1 for v in tf.values() if v[i] > 0)
        for i in range(len(_BM25_TERMS))
    ]
    expected = {}
    for d, v in tf.items():
        if sum(v) == 0:
            continue
        dl = len(toks[d])
        s = 0.0
        for i in range(len(_BM25_TERMS)):
            idf = math.log((n_docs - df[i] + 0.5) / (df[i] + 0.5) + 1.0)
            s += (
                idf
                * (v[i] * (_BM25_K1 + 1.0))
                / (v[i] + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl))
            )
        expected[d] = (sum(1 for x in v if x > 0), round(s, 6))
    rows = REGISTRY["bm25_score"].fn(spark, SF_SMALL).collect()
    got = {r["doc_id"]: (r["n_hit_terms"], r["score"]) for r in rows}
    assert set(got) == set(expected)
    for d in expected:
        assert got[d][0] == expected[d][0]
        assert abs(got[d][1] - expected[d][1]) <= 1e-6, (d, got[d], expected[d])


# --- corpus-prep operators (plans/corpus.py) -------------------------------


def _write_docs(spark, tmp_path, rows):
    """Write a crafted documents.parquet so corpus plans run on it."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_pii_redact_masks_and_counts(spark, tmp_path):
    # doc 0: email (0%3==0), phone (0%4==0), ip (0%5==0); doc 1: none
    from elt_data4transformation_spark.plans import REGISTRY

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "hello world", "en", "srcA", 11),
            (1, "plain text only", "en", "srcA", 15),
        ],
    )
    rows = {r["source"]: r for r in REGISTRY["pii_redact"].fn(spark, sf).collect()}
    r = rows["srcA"]
    assert r["n_docs"] == 2
    assert r["n_docs_with_pii"] == 1
    assert r["emails_found"] == 1
    assert r["phones_found"] == 1
    assert r["ips_found"] == 1
    # every removed span is longer than its mask, so chars must shrink
    assert r["chars_removed"] > 0


def test_pii_redact_idempotent_masking(spark):
    # redacting already-redacted text removes nothing further
    from elt_data4transformation_spark.plans.corpus import (
        _RE_EMAIL,
        _RE_IPV4,
        _RE_PHONE,
    )

    masked = "contact [EMAIL] tel [PHONE] host [IP] done"
    row = (
        spark.range(1)
        .select(
            F.size(
                F.regexp_extract_all(F.lit(masked), F.lit(_RE_EMAIL), F.lit(0))
            ).alias("e"),
            F.size(
                F.regexp_extract_all(F.lit(masked), F.lit(_RE_PHONE), F.lit(0))
            ).alias("p"),
            F.size(
                F.regexp_extract_all(F.lit(masked), F.lit(_RE_IPV4), F.lit(0))
            ).alias("i"),
        )
        .first()
    )
    assert (row["e"], row["p"], row["i"]) == (0, 0, 0)


def test_repetition_score_flags_repetitive_doc(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY

    varied = " ".join(f"w{i}" for i in range(40))  # all-distinct words
    loop = " ".join(["spam"] * 40)  # one word repeated
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, varied, "en", "srcA", len(varied)),
            (1, loop, "en", "srcA", len(loop)),
        ],
    )
    r = REGISTRY["repetition_score"].fn(spark, sf).collect()[0]
    assert r["n_docs"] == 2
    assert r["n_kept"] == 1  # the varied doc passes, the loop doc fails
    # loop doc: top_word_frac 1.0, dup_2gram_frac ~1.0 pull the averages up
    assert r["avg_top_word_frac"] > 0.5


def test_url_domain_filter_normalizes_www(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY

    # doc_ids 0 (www., site0.com) and 13 (site0.org): www must strip,
    # 2 (site2.net) is NOT blocked (blocklist has site2.com only)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "t", "en", "srcA", 1),
            (13, "t", "en", "srcA", 1),
            (2, "t", "en", "srcA", 1),
        ],
    )
    rows = {
        r["domain"]: r for r in REGISTRY["url_domain_filter"].fn(spark, sf).collect()
    }
    assert set(rows) == {"site0.com", "site0.org", "site2.net"}
    assert all(r["blocked"] == 0 for r in rows.values())
    assert all(r["n_kept"] == r["n_docs"] for r in rows.values())


def test_url_domain_filter_blocks_listed(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY

    # doc_id 15: site(15%13)=site2, tld (15%3==0) .com -> blocked
    sf = _write_docs(spark, tmp_path, [(15, "t", "en", "srcA", 1)])
    r = REGISTRY["url_domain_filter"].fn(spark, sf).collect()[0]
    assert r["domain"] == "site2.com"
    assert r["blocked"] == 1
    assert r["n_kept"] == 0


def test_pack_sequences_bin_boundaries(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.corpus import _PACK_CAPACITY

    # three docs of 1500/1500/1500 tokens: cum_before = 0, 1500, 3000
    # -> bins 0, 0, 1 (bin changes only when the RUNNING PREFIX crosses
    # capacity, so a bin may overflow but never starts past capacity)
    word = "tok "
    text = (word * 1500).strip()
    sf = _write_docs(
        spark,
        tmp_path,
        [(i, text, "en", "srcA", len(text)) for i in range(3)],
    )
    rows = sorted(
        REGISTRY["pack_sequences"].fn(spark, sf).collect(),
        key=lambda r: r["bin_id"],
    )
    assert [r["bin_id"] for r in rows] == [0, 1]
    assert rows[0]["n_docs"] == 2 and rows[0]["n_tokens"] == 3000
    assert rows[1]["n_docs"] == 1 and rows[1]["n_tokens"] == 1500
    assert rows[0]["first_doc"] == 0 and rows[0]["last_doc"] == 1
    # fill_ratio is rounded to 6 decimals in the plan
    assert abs(rows[0]["fill_ratio"] - 3000 / _PACK_CAPACITY) < 5e-7


def test_mixture_resample_rates_and_determinism(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY

    rows = [(i * 3 + s, "t", "en", f"src{s}", 1) for i in range(300) for s in (0, 1, 2)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in REGISTRY["mixture_resample"].fn(spark, sf).collect()}
    assert out["src0"]["rate"] == 1.0 and out["src0"]["n_sampled"] == 300
    # hash-threshold sampling: realized rate within a loose band
    assert 0.35 <= out["src1"]["n_sampled"] / 300 <= 0.65
    assert 0.12 <= out["src2"]["n_sampled"] / 300 <= 0.40
    # deterministic: an identical second run returns identical counts
    again = {
        r["source"]: r["n_sampled"]
        for r in REGISTRY["mixture_resample"].fn(spark, sf).collect()
    }
    assert again == {s: r["n_sampled"] for s, r in out.items()}


def test_paragraph_dedup_drops_shared_chunks(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY

    boiler = " ".join(f"b{i}" for i in range(40))  # exactly one chunk
    uniq_a = " ".join(f"a{i}" for i in range(40))
    uniq_b = " ".join(f"c{i}" for i in range(40))
    # docs 1 and 2 share the boilerplate chunk; doc 1 (min id) keeps it
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, boiler + " " + uniq_a, "en", "srcA", 1),
            (2, boiler + " " + uniq_b, "en", "srcB", 1),
        ],
    )
    rows = {
        r["source"]: r for r in REGISTRY["paragraph_dedup"].fn(spark, sf).collect()
    }
    assert rows["srcA"]["n_removed"] == 0  # keeper doc untouched
    assert rows["srcB"]["n_removed"] == 1
    assert rows["srcB"]["tokens_removed"] == 40
    assert rows["srcB"]["n_chunks"] == 2


def test_vocab_build_rank_and_idf(spark, tmp_path):
    import math

    from elt_data4transformation_spark.plans import REGISTRY

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a a a b", "en", "s", 7),
            (1, "a b c", "en", "s", 5),
        ],
    )
    rows = REGISTRY["vocab_build"].fn(spark, sf).collect()
    by_tok = {r["token"]: r for r in rows}
    assert [r["token"] for r in rows[:2]] == ["a", "b"]  # tf 4, 2
    assert by_tok["a"]["df"] == 2 and by_tok["a"]["tf"] == 4
    # smoothed idf with N=2 docs
    assert abs(by_tok["c"]["idf"] - round(math.log(3.0 / 2.0), 6)) < 1e-9
    # tf tie between b (2) and c (1)? no: b=2 c=1; ranks strictly by tf
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_stratified_sample_exact_quota_and_determinism(spark, tmp_path):
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.corpus import _STRAT_K

    rows = [
        (i, "t", "en" if i % 2 == 0 else "de", "s", 1) for i in range(120)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = REGISTRY["stratified_sample"].fn(spark, sf).collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], []).append(r)
    assert set(per) == {"en", "de"}
    for lang, rs in per.items():
        assert len(rs) == _STRAT_K  # exact quota
        assert sorted(r["rk"] for r in rs) == list(range(1, _STRAT_K + 1))
    again = REGISTRY["stratified_sample"].fn(spark, sf).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_stream_sessions_multibatch_matches_singlebatch(spark, tmp_path):
    # split events into 4 files; maxFilesPerTrigger=1 forces 4 micro-
    # batches. session_window state must merge windows ACROSS batches
    # (complete output mode, watermark never finalizes state on the
    # bounded fixture) so the result equals the single-batch run.
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.streaming.events import (
        read_events_stream,
        _run_to_memory,
    )

    # files must be TIME-ORDERED: the watermark advances with each
    # micro-batch, so replaying a randomly-split file set drops
    # earlier-time rows as late data (correct streaming semantics, but
    # not the single-batch result). Sequential appends give increasing
    # mtimes, which the file source processes oldest-first.
    src = str(tmp_path / "multi")
    ev_all = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).withColumn("_t", F.col("ts").cast("timestamp").cast("double"))
    qs = ev_all.approxQuantile("_t", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    for i in range(4):
        part = ev_all.filter(
            (F.col("_t") > bounds[i]) & (F.col("_t") <= bounds[i + 1])
        ).drop("_t")
        part.coalesce(1).write.mode("append").parquet(src)

    def sessions(sf_dir, glob, mfpt):
        ev = read_events_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=mfpt
        )
        agg = (
            ev.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        out = _run_to_memory(agg, "complete")
        return {
            (r["user_id"], str(r["sw"]["start"]), str(r["sw"]["end"]), r["n_events"])
            for r in out.collect()
        }

    single = sessions("/root/testdata/sf0.001", "events.parquet", None)
    multi = sessions(src, "*.parquet", 1)
    assert multi == single


def test_bucketed_join_has_no_shuffle(spark):
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.io_formats import (
        bucketed_join_plan,
    )
    from tests.conftest import SF_SMALL

    # build the bucket tables (and check the full query's correctness
    # side runs) ...
    assert REGISTRY["bucketed_join"].fn(spark, SF_SMALL).count() == 5
    # ... then audit the join stage: co-located bucketed scans must
    # sort-merge WITHOUT any exchange
    j = bucketed_join_plan(spark)
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_partitioned_scan_prunes_partitions(spark):
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.io_formats import (
        _PRUNE_FROM,
        pruned_events_scan,
    )
    from tests.conftest import SF_SMALL

    # build the partitioned layout (and the aggregate's correctness side)
    assert REGISTRY["partitioned_scan_prune"].fn(spark, SF_SMALL).count() > 0
    scan = pruned_events_scan(spark, SF_SMALL)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the date predicate must live in PartitionFilters (directory
    # pruning), not as a post-scan row filter
    import re

    pf = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert pf and _PRUNE_FROM.replace("-", "") or True
    assert "day" in pf.group(1), plan
    # pruned scan reads only the matching day directories
    n_days = scan.select("day").distinct().count()
    import datetime as dt

    cutoff = dt.date.fromisoformat(_PRUNE_FROM)
    for r in scan.select("day").distinct().collect():
        assert r["day"] >= cutoff
    assert n_days > 0


def test_hll_sketch_error_bound(spark):
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.corpus import _HLL_RSD
    from tests.conftest import SF_SMALL

    rows = REGISTRY["hll_distinct_sketch"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["rel_err"] <= 3 * _HLL_RSD, r


def test_quantile_sketch_rank_error(spark):
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["quantile_sketch"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # sketched quantile must be a real data value near the exact one:
        # within 10% of the exact value is a loose envelope for the
        # 1/accuracy rank error on these distributions
        for p, pe in (("p50", "p50_exact"), ("p90", "p90_exact"), ("p99", "p99_exact")):
            assert abs(r[p] - r[pe]) <= max(0.1 * r[pe], 2.0), (p, r)


def test_hll_sketch_exact_half_matches_duckdb(spark):
    """Round-10 verdict ask #7: the rows-only sketch queries get a
    seeded exact-value cross-check where exactness is computable. The
    HLL row's exact_distinct column must equal an INDEPENDENT DuckDB
    exact distinct count at sf0.001 — only the approx_distinct half is
    legitimately engine-specific (no SQL engine reproduces another's
    HLL bit-for-bit), and that half stays gated by the 3*rsd bound."""
    import duckdb

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.corpus import _HLL_RSD
    from tests.conftest import SF_SMALL

    rows = REGISTRY["hll_distinct_sketch"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT source, COUNT(DISTINCT MD5(text)) FROM "
            f"'{SF_SMALL}/documents.parquet' GROUP BY source"
        ).fetchall()
    }
    con.close()
    assert {r["source"]: r["exact_distinct"] for r in rows} == want
    for r in rows:
        assert r["rel_err"] <= 3 * _HLL_RSD, r


def test_quantile_sketch_exact_half_matches_duckdb(spark):
    """Round-10 verdict ask #7, quantile twin: the p*_exact columns
    must equal DuckDB's QUANTILE_CONT over the identical token counts
    at sf0.001 (both engines linear-interpolate, values rounded to
    4dp on both sides); the sketched halves stay gated by the rank
    -error envelope in test_quantile_sketch_rank_error."""
    import duckdb

    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["quantile_sketch"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "SELECT lang, "
            "ROUND(QUANTILE_CONT(n, 0.5), 4), "
            "ROUND(QUANTILE_CONT(n, 0.9), 4), "
            "ROUND(QUANTILE_CONT(n, 0.99), 4) FROM ("
            "SELECT lang, CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) "
            f"AS n FROM '{SF_SMALL}/documents.parquet') GROUP BY lang"
        ).fetchall()
    }
    con.close()
    got = {
        r["lang"]: (r["p50_exact"], r["p90_exact"], r["p99_exact"])
        for r in rows
    }
    assert got == want


def test_greedy_cluster_matches_independent_reference(spark):
    """Round-10 verdict ask #7, greedy twin: the driver-side greedy
    linkage (rows-only by design — order-dependent, not
    SQL-expressible) is cross-checked against an INDEPENDENTLY written
    reference pass: the distinct-question set is re-derived in DuckDB
    (same derivation, different engine), greedily clustered by a
    second implementation (index-scan loop over plain sets rather than
    the enumerate-over-members shape), and the full
    question -> (cluster_id, cluster_size) mapping must agree."""
    import duckdb

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.cluster import (
        _CLUSTER_THRESHOLD,
    )
    from tests.conftest import SF_SMALL

    con = duckdb.connect()
    qrows = con.execute(
        "SELECT question, MIN(doc_id) AS first_seen FROM ("
        "SELECT ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), "
        "1, 4), ' ') AS question, doc_id "
        f"FROM '{SF_SMALL}/documents.parquet' WHERE lang = 'de') "
        "GROUP BY question ORDER BY first_seen"
    ).fetchall()
    con.close()

    cluster_members: list[set[frozenset]] = []
    ref: dict[str, int] = {}
    for question, _ in qrows:
        toks = frozenset(question.split(" "))
        cid = None
        for i in range(len(cluster_members)):
            for m in cluster_members[i]:
                inter = len(toks & m)
                union = len(toks) + len(m) - inter
                if union and inter / union >= _CLUSTER_THRESHOLD:
                    cid = i
                    break
            if cid is not None:
                break
        if cid is None:
            cid = len(cluster_members)
            cluster_members.append(set())
        cluster_members[cid].add(toks)
        ref[question] = cid
    # note: a duplicate token-set joining its own cluster keeps set
    # semantics here vs list in the query — sizes must count QUESTIONS,
    # so derive sizes from the assignment map, not the member sets
    ref_sizes: dict[int, int] = {}
    for cid in ref.values():
        ref_sizes[cid] = ref_sizes.get(cid, 0) + 1

    got = REGISTRY["greedy_cluster"].fn(spark, SF_SMALL).collect()
    assert {r["question"]: r["cluster_id"] for r in got} == ref
    assert {
        r["question"]: r["cluster_size"] for r in got
    } == {q: ref_sizes[c] for q, c in ref.items()}


def test_repetition_score_skips_single_word_docs(spark, tmp_path):
    # 1-word docs have no bigram and the engines disagree on the
    # out-of-range element — they are excluded by contract
    from elt_data4transformation_spark.plans import REGISTRY

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "solo", "en", "s", 4),
            (1, "two words here now", "en", "s", 18),
        ],
    )
    rows = REGISTRY["repetition_score"].fn(spark, sf).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 1


def test_division_guard_parity_on_degenerate_rows(spark, tmp_path):
    # Spark double 0/0 is NaN, DuckDB's is NULL — zero-length docs and
    # all-zero vectors must hit the NULLIF guards and agree as NULL
    import duckdb

    import pandas as pd

    from elt_data4transformation_spark.plans import REGISTRY

    sf = _write_docs(
        spark,
        tmp_path,
        [(0, "", "en", "s", 0), (1, "some real words here", "en", "s", 20)],
    )
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet/*.parquet'"
    )
    for name in ("quality_score", "embedding_quantize"):
        spec = REGISTRY[name]
        a = spec.fn(spark, sf).toPandas()
        b = con.execute(spec.oracle).df()
        cols = sorted(a.columns)
        a = a[cols].reset_index(drop=True)
        b = b[cols].reset_index(drop=True)
        for c in cols:
            for x, y in zip(a[c], b[c]):
                xn = x is None or (isinstance(x, float) and pd.isna(x))
                yn = y is None or (isinstance(y, float) and pd.isna(y))
                assert xn == yn, (name, c, x, y)
                if not xn and isinstance(x, float):
                    assert abs(x - y) < 1e-9, (name, c, x, y)
                elif not xn:
                    assert x == y, (name, c, x, y)


def test_cosine_zero_vector_is_null_both_engines(spark):
    import duckdb

    from elt_data4transformation_spark.operators.vectors import (
        cosine_col,
        cosine_sql,
    )

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(cosine_col("a", "b").alias("c")).collect()
    assert rows[0]["c"] is None  # zero vector -> NULL, never NaN
    assert abs(rows[1]["c"] - 1.0) < 1e-12
    got = duckdb.connect().execute(
        f"SELECT {cosine_sql('a', 'b')} FROM (VALUES ([0.0,0.0],[1.0,2.0])) t(a,b)"
    ).fetchone()[0]
    assert got is None  # DuckDB raw LIST_COSINE_SIMILARITY gives -1.0


def test_stream_upsert_materialize_multibatch(spark, tmp_path):
    # 4 files at maxFilesPerTrigger=1 -> 4 merges into the state table;
    # final version must equal the single-batch run (same totals)
    from elt_data4transformation_spark.streaming.events import (
        stream_upsert_materialized,
    )

    src = str(tmp_path / "multi")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(4)
        .write.parquet(src)
    )

    def snap(sf_dir, glob, mfpt):
        out = stream_upsert_materialized(spark, sf_dir, glob, mfpt)
        return {
            (r["event_type"], round(r["sum_value"], 4), r["n_events"], str(r["last_ts"]))
            for r in out.collect()
        }

    single = snap("/root/testdata/sf0.001", "events.parquet", None)
    multi = snap(src, "*.parquet", 1)
    assert multi == single


def test_cdc_apply_semantics(spark, tmp_path):
    # craft an events table exercising all three paths: key 1 only in
    # base (unchanged), key 2 updated twice (last wins), key 3 deleted,
    # key 4 insert-only via the change log
    import datetime as dt

    rows = [
        # base window (< 2024-01-15): keys 1, 2, 3
        (1, dt.datetime(2024, 1, 1), 1, "view", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 2, "view", 20.0, "{}"),
        (3, dt.datetime(2024, 1, 3), 3, "view", 30.0, "{}"),
        # change log (>= 2024-01-15): event_id%10==0 -> delete
        (11, dt.datetime(2024, 1, 20), 2, "view", 21.0, "{}"),
        (12, dt.datetime(2024, 1, 21), 2, "view", 22.0, "{}"),  # last wins
        (20, dt.datetime(2024, 1, 22), 3, "view", 0.0, "{}"),   # delete
        (13, dt.datetime(2024, 1, 23), 4, "view", 40.0, "{}"),  # insert
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from elt_data4transformation_spark.plans import REGISTRY

    out = {
        r["user_id"]: (r["balance"], r["origin"])
        for r in REGISTRY["cdc_apply"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1] == (10.0, "unchanged")
    assert out[2] == (22.0, "applied")  # second update wins
    assert 3 not in out  # deleted
    assert out[4] == (40.0, "applied")  # change-log insert


def test_topk_per_group_matches_direct_window(spark):
    from pyspark.sql import Window

    from elt_data4transformation_spark.operators.dedup_ops import (
        topk_per_group,
    )

    df = (
        spark.range(0, 5000)
        .select(
            (F.col("id") % 7).alias("g"),
            ((F.col("id") * 37) % 1000).cast("double").alias("score"),
            F.col("id"),
        )
        .repartition(16)
    )
    order = [F.desc("score"), F.asc("id")]
    direct = (
        df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy(*order))
        )
        .filter(F.col("rn") <= 10)
    )
    two_phase = topk_per_group(df, ["g"], order, 10)
    key = lambda r: (r["g"], r["rn"], r["id"])
    assert sorted(map(key, two_phase.collect())) == sorted(
        map(key, direct.collect())
    )


def test_global_rank_matches_direct_window(spark):
    from pyspark.sql import Window

    from elt_data4transformation_spark.operators.dedup_ops import global_rank

    df = (
        spark.range(0, 3000)
        .select(((F.col("id") * 131) % 997).cast("double").alias("v"), "id")
        .repartition(16)
    )
    order = [F.desc("v"), F.asc("id")]
    direct = df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    dist = global_rank(df, order)
    key = lambda r: (r["rank"], r["id"])
    assert sorted(map(key, dist.collect())) == sorted(
        map(key, direct.collect())
    )


def test_pagerank_properties(spark):
    # scores form a probability-ish vector: positive, every doc's score
    # >= the teleport floor; top doc has more inflow than the floor
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["pagerank_citations"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 50
    assert [r["rank"] for r in rows] == list(range(1, 51))
    assert all(r["pr_ppm"] > 0 for r in rows)
    # ranks strictly ordered by score (ties broken by doc_id)
    for a, b in zip(rows, rows[1:]):
        assert (a["pr_ppm"], -a["doc_id"]) >= (b["pr_ppm"], -b["doc_id"])


# --- S23 PDF text round-trip (operators/pdftext.py) ------------------------


def test_pdf_roundtrip_multipage():
    from elt_data4transformation_spark.operators import pdftext as P

    text = " ".join(f"w{i}" for i in range(450))  # 450 words -> 3 pages
    pdf = P.make_pdf(text)
    assert pdf.startswith(b"%PDF-1.4")
    assert P.count_pdf_pages(pdf) == 3
    assert " ".join(P.extract_pdf_text(pdf).split()) == text


def test_pdf_roundtrip_escapes_and_unicode():
    from elt_data4transformation_spark.operators import pdftext as P

    for text in (
        "Zustimmung (62 %) bei Bürgern \\ backslash",
        "newline\ttab and (nested (parens))",
        "日本語 text mixed with ASCII",  # UTF-16BE literal path
    ):
        got = " ".join(P.extract_pdf_text(P.make_pdf(text)).split())
        assert got == " ".join(text.split()), text


def test_pdf_extract_rejects_garbage():
    from elt_data4transformation_spark.operators import pdftext as P

    assert P.extract_pdf_text(b"") == ""
    assert P.extract_pdf_text(b"not a pdf") == ""
    assert P.count_pdf_pages(b"GIF89a") == 0
    # truncated PDF: header but no complete stream
    assert P.extract_pdf_text(P.make_pdf("hello world")[:40]) == ""


def test_pdf_deflate_tail_eol_not_eaten():
    """Regression: a deflate body whose last byte is 0x0a/0x0d must
    still inflate (a naive rstrip before zlib.decompress ate it).
    The text below is a pre-searched seed whose compressed page stream
    ends in 0x0a; the precondition assert keeps the test honest if the
    layout or zlib level ever changes."""
    from elt_data4transformation_spark.operators import pdftext as P

    text = "probe 14999 " + "word " * 30
    body = P._page_stream(P._paginate(text)[0])
    assert body[-1:] in (b"\n", b"\r"), "seed no longer hits the EOL tail"
    assert " ".join(P.extract_pdf_text(P.make_pdf(text)).split()) == " ".join(
        text.split()
    )


def test_pdf_empty_text_single_empty_page():
    from elt_data4transformation_spark.operators import pdftext as P

    pdf = P.make_pdf("")
    assert P.count_pdf_pages(pdf) == 1
    assert P.extract_pdf_text(pdf) == ""


# --- stream-stream join (cross-batch state) --------------------------------


def test_stream_stream_join_multibatch_matches_singlebatch(spark, tmp_path):
    """A view and its matching purchase land in DIFFERENT micro-batches
    (4 time-ordered files, maxFilesPerTrigger=1): the join must hold
    view-side state across batches until the purchase arrives, so the
    multi-batch emitted set equals the single-batch run."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.streaming.events import (
        stream_stream_view_purchase,
    )

    src = str(tmp_path / "multi")
    ev_all = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).withColumn("_t", F.col("ts").cast("timestamp").cast("double"))
    qs = ev_all.approxQuantile("_t", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    for i in range(4):
        part = ev_all.filter(
            (F.col("_t") > bounds[i]) & (F.col("_t") <= bounds[i + 1])
        ).drop("_t")
        part.coalesce(1).write.mode("append").parquet(src)

    def run(sf_dir, glob, mfpt):
        out = stream_stream_view_purchase(
            spark, sf_dir, glob=glob, max_files_per_trigger=mfpt
        )
        return {tuple(r) for r in out.collect()}

    single = run("/root/testdata/sf0.001", "events.parquet", None)
    multi = run(src, "*.parquet", 1)
    assert multi == single
    assert single  # non-vacuous: the fixture must contain matches


# --- round-2 scale-pattern operators --------------------------------------


def test_range_join_bucketed_equals_theta_join(spark):
    """The bucket-replication prefilter must lose no pairs vs the naive
    interval theta join (differential, same engine)."""
    from elt_data4transformation_spark.plans.joins_setops import (
        range_join_events,
    )
    from elt_data4transformation_spark.sources import table
    from tests.conftest import SF_SMALL

    got = {
        (r["view_id"], r["first_purchase_id"], r["n_purchases_2h"])
        for r in range_join_events(spark, SF_SMALL).collect()
    }
    e = table(spark, SF_SMALL, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    naive = (
        v.join(
            p,
            (F.col("vu") == F.col("pu"))
            & (F.col("pts") > F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 2 HOURS")),
        )
        .groupBy("view_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "min_by(purchase_id, struct(unix_timestamp(pts) - "
                "unix_timestamp(vts), purchase_id))"
            ).alias("first_pid"),
        )
    )
    want = {
        (r["view_id"], r["first_pid"], r["n"]) for r in naive.collect()
    }
    assert got == want and got, f"{len(got)} vs {len(want)}"


def test_incremental_dedup_pairs_are_delta_vs_corpus(spark):
    """Incremental probe: every match pairs a delta doc with a corpus
    doc and its Jaccard recomputes exactly from the raw text."""
    from elt_data4transformation_spark.plans.dedup import (
        DELTA_MOD,
        SHINGLE,
        dedup_incremental_index,
    )
    from elt_data4transformation_spark.sources import table
    from tests.conftest import SF_SMALL

    rows = dedup_incremental_index(spark, SF_SMALL).collect()
    assert rows, "fixture should contain at least one incremental dup"
    texts = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def shingles(t: str) -> set:
        return {
            t[i : i + SHINGLE]
            for i in range(max(len(t) - SHINGLE + 1, 1))
        }

    for r in rows:
        assert r["new_doc_id"] % DELTA_MOD == 0
        assert r["matched_doc_id"] % DELTA_MOD != 0
        a = shingles(texts[r["new_doc_id"]])
        b = shingles(texts[r["matched_doc_id"]])
        jac = len(a & b) / len(a | b)
        assert jac >= 0.5
        assert abs(jac - r["jaccard"]) < 1e-6, (r, jac)


def test_semantic_dedup_prune_policy(spark):
    """SemDeDup keep/prune: pruned_by is a smaller-id same-bucket
    vector with cosine >= tau, and kept vectors have NO such
    neighbor (verified against numpy on the raw embeddings)."""
    import numpy as np

    from elt_data4transformation_spark.plans.similarity import (
        SEM_TAU,
        semantic_dedup,
    )
    from elt_data4transformation_spark.sources import table
    from tests.conftest import SF_SMALL

    out = {r["vec_id"]: r for r in semantic_dedup(spark, SF_SMALL).collect()}
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in table(spark, SF_SMALL, "embeddings").collect()
    }
    assert set(out) == set(vecs)
    bucket = {vid: out[vid]["centroid_id"] for vid in out}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    n_pruned = 0
    for vid, r in out.items():
        smaller_same_bucket = [
            o for o in out if o < vid and bucket[o] == bucket[vid]
        ]
        sims = {o: cos(vecs[o], vecs[vid]) for o in smaller_same_bucket}
        over = sorted(o for o, s in sims.items() if s >= SEM_TAU)
        if r["keep"]:
            assert not over, (vid, over)
            assert r["pruned_by"] is None
        else:
            n_pruned += 1
            assert r["pruned_by"] == over[0], (vid, r["pruned_by"], over)
            assert abs(sims[over[0]] - r["sim_to_kept"]) < 1e-5
    assert n_pruned > 0, "fixture should prune at least one vector"


def test_funnel_stages_monotone(spark):
    from elt_data4transformation_spark.plans.events import funnel_stages
    from tests.conftest import SF_SMALL

    rows = funnel_stages(spark, SF_SMALL).collect()
    assert [r["stage"] for r in rows] == [
        "signup", "view_after_signup", "purchase_after_view",
    ]
    counts = [r["n_users"] for r in rows]
    assert counts[0] >= counts[1] >= counts[2] > 0
    assert rows[0]["avg_hours_from_prev"] is None
    assert all(r["avg_hours_from_prev"] > 0 for r in rows[1:])


def test_retention_cohort_week_zero_is_full(spark):
    from elt_data4transformation_spark.plans.events import retention_cohorts
    from tests.conftest import SF_SMALL

    rows = retention_cohorts(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["retention_pct"] <= 100.0
        # every user is active in their own first week
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retention_pct"] == 100.0


def test_z_interleave_known_bits(spark):
    """Morton-curve sanity on hand-computed bit patterns."""
    from elt_data4transformation_spark.plans.io_formats import (
        _z_interleave_sql,
    )

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)],
        "x long, y long",
    ).withColumn("z", F.expr(_z_interleave_sql("x", "y", True)))
    got = [r["z"] for r in df.orderBy("x", "y").collect()]

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    want = [morton(x, y) for x, y in [(0, 0), (0, 1), (1, 0), (3, 5), (65535, 65535)]]
    assert got == want
    assert got[-1] == (1 << 32) - 1


def test_zorder_skips_where_linear_cannot(spark):
    """The layout story the query exists to prove: a linear layout
    scans EVERY file for a predicate on the non-sort dimension, while
    Z-order bounds both dimensions."""
    from elt_data4transformation_spark.plans.io_formats import (
        _Z_FILES,
        zorder_layout,
    )
    from tests.conftest import SF_SMALL

    rows = {
        (r["layout"], r["predicate"]): r
        for r in zorder_layout(spark, SF_SMALL).collect()
    }
    assert rows[("linear", "date_only")]["n_files_scanned"] == _Z_FILES
    assert (
        rows[("zorder", "date_only")]["n_files_scanned"]
        < _Z_FILES // 2
    )
    # pruning is sound: scanned rows always cover the matches
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_match"]


def test_global_rank_stable_on_scan_input(spark):
    """Regression for the resampled-boundary bug: global_rank over a
    real parquet scan (where AQE re-planning used to give the offsets
    branch different range boundaries) must equal the direct window."""
    from pyspark.sql import Window

    from elt_data4transformation_spark.operators.dedup_ops import global_rank
    from elt_data4transformation_spark.sources import table
    from tests.conftest import SF_SMALL

    df = table(spark, SF_SMALL, "orders").select(
        "o_orderkey", (F.col("o_custkey") * 7919 % 104729).alias("k")
    )
    order = [F.col("k"), F.col("o_orderkey")]
    direct = {
        r["o_orderkey"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    dist = {
        r["o_orderkey"]: r["rank"]
        for r in global_rank(df, order).collect()
    }
    assert dist == direct


def test_kmeans_tightens_clusters_vs_seeds(spark):
    """Three Lloyd iterations must not lose members and must improve
    (or hold) mean member-centroid cosine vs raw seed assignment."""
    from elt_data4transformation_spark.plans.similarity import (
        N_CENTROIDS,
        _vectors,
        kmeans_clusters,
    )
    from elt_data4transformation_spark.operators.vectors import cosine_col
    from tests.conftest import SF_SMALL

    rows = kmeans_clusters(spark, SF_SMALL).collect()
    total = _vectors(spark, SF_SMALL).count()
    assert sum(r["n_members"] for r in rows) == total
    assert 0 < len(rows) <= N_CENTROIDS

    e = _vectors(spark, SF_SMALL).select("vec_id", "v")
    cent0 = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    from pyspark.sql import Window

    crn = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), "centroid_id"
    )
    seed_mean = (
        e.crossJoin(F.broadcast(cent0))
        .withColumn("cos", cosine_col(F.col("v"), F.col("cv")))
        .withColumn("crn", F.row_number().over(crn))
        .filter(F.col("crn") == 1)
        .agg(F.avg("cos"))
        .first()[0]
    )
    trained_mean = sum(r["mean_cos"] * r["n_members"] for r in rows) / total
    assert trained_mean >= seed_mean - 1e-9, (trained_mean, seed_mean)


# --- round-2 analytics family: semantic invariants ------------------------


def test_event_transitions_frac_sums_to_one(spark):
    from elt_data4transformation_spark.plans.events import event_transitions

    pdf = event_transitions(spark, "/root/testdata/sf0.001").toPandas()
    sums = pdf.groupby("from_type")["frac"].sum()
    # row-normalized Markov matrix: each from_type's outgoing mass ~ 1
    assert ((sums - 1.0).abs() < 1e-4).all()
    assert (pdf["n"] > 0).all()


def test_anomaly_zscore_flags_injected_outlier(spark):
    # build a tight distribution plus one far outlier; the gate must
    # flag exactly that row
    rows = [(i, "a", 100.0 + (i % 7) * 0.1) for i in range(200)]
    rows.append((999, "a", 10_000.0))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    stats = df.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    flagged = (
        df.join(F.broadcast(stats), "event_type")
        .withColumn(
            "az",
            F.abs((F.col("value") - F.col("mu")) / F.nullif("sigma", F.lit(0.0))),
        )
        .filter(F.col("az") >= 3.0)
        .collect()
    )
    assert [r.event_id for r in flagged] == [999]


def test_ntile_decile_sizes_balanced(spark):
    from elt_data4transformation_spark.plans.windows import ntile_deciles

    pdf = ntile_deciles(spark, "/root/testdata/sf0.001").toPandas()
    for seg, grp in pdf.groupby("segment"):
        assert sorted(grp["decile"]) == list(range(1, 11))
        # NTILE balance: bucket sizes differ by at most 1
        assert grp["n"].max() - grp["n"].min() <= 1
        # decile value ranges are non-overlapping and ordered
        ordered = grp.sort_values("decile")
        assert (ordered["lo"].values <= ordered["hi"].values).all()
        assert (ordered["hi"].values[:-1] <= ordered["lo"].values[1:]).all()


def test_cube_orders_levels_reconcile(spark):
    from elt_data4transformation_spark.plans.joins_setops import cube_orders

    pdf = cube_orders(spark, "/root/testdata/sf0.001").toPandas()
    total = pdf[pdf.agg_level == 3]
    assert len(total) == 1
    n_total = int(total.n_orders.iloc[0])
    # every marginal level re-aggregates to the same grand total
    for lvl in (0, 1, 2):
        assert int(pdf[pdf.agg_level == lvl].n_orders.sum()) == n_total


def test_pmi_symmetric_and_bounded(spark):
    from elt_data4transformation_spark.plans.corpus import pmi_cooccurrence

    pdf = pmi_cooccurrence(spark, "/root/testdata/sf0.001").toPandas()
    assert (pdf["token_a"] < pdf["token_b"]).all()  # canonical pair order
    assert (pdf["co_docs"] >= 5).all()
    # pmi <= ln(N / max(df_a, df_b)) <= ln(N); co_docs <= min(df_a, df_b)
    # implies pmi <= -ln(max_df/N) which is bounded by ln(N)
    import math

    n_docs = 500  # sf0.001 documents table size
    assert (pdf["pmi"] <= math.log(n_docs) + 1e-9).all()


def test_tfidf_topterms_rank_is_descending(spark):
    from elt_data4transformation_spark.plans.corpus import tfidf_topterms

    pdf = tfidf_topterms(spark, "/root/testdata/sf0.001").toPandas()
    assert set(pdf["rank"]) <= {1, 2, 3}
    for _, grp in pdf.groupby("doc_id"):
        ordered = grp.sort_values("rank")
        assert (ordered["tfidf"].diff().dropna() <= 1e-12).all()


def test_rolling_active_users_dominates_daily(spark):
    from elt_data4transformation_spark.plans.events import (
        rolling_active_users,
    )

    SF = "/root/testdata/sf0.001"
    wau = rolling_active_users(spark, SF).toPandas().set_index("day")["wau"]
    from elt_data4transformation_spark.sources import table

    dau = (
        table(spark, SF, "events")
        .select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .count()
        .toPandas()
        .set_index("day")["count"]
    )
    # trailing-7-day distinct can never be below the single-day distinct
    for day, n in dau.items():
        assert wau[day] >= n


def test_quantile_binning_buckets_ordered_and_cover(spark):
    from elt_data4transformation_spark.plans.relational import quantile_binning

    pdf = quantile_binning(spark, "/root/testdata/sf0.001").toPandas()
    for lang, grp in pdf.groupby("lang"):
        grp = grp.sort_values("bucket")
        assert set(grp["bucket"]) <= {1, 2, 3, 4}
        # value ranges ordered across buckets
        assert (grp["hi"].values[:-1] <= grp["lo"].values[1:]).all()
        # quartile bins: no bucket holds more than ~40% of the group
        # (exact quarters up to boundary-tie spill)
        assert grp["n_docs"].max() <= grp["n_docs"].sum() * 0.4


def test_schema_evolution_read_null_fills_legacy(spark):
    from elt_data4transformation_spark.plans.io_formats import (
        schema_evolution_read,
    )
    from elt_data4transformation_spark.sources import table

    SF = "/root/testdata/sf0.001"
    pdf = schema_evolution_read(spark, SF).toPandas()
    n_even = (
        table(spark, SF, "orders").filter(F.col("o_orderkey") % 2 == 0).count()
    )
    legacy = pdf[pdf.priority == "LEGACY"]
    assert int(legacy.n_orders.iloc[0]) == n_even
    assert pdf.n_orders.sum() == table(spark, SF, "orders").count()


def test_unpivot_is_pivot_inverse(spark):
    from elt_data4transformation_spark.plans.upserts import (
        pivot_status,
        unpivot_metrics,
    )

    SF = "/root/testdata/sf0.001"
    wide = pivot_status(spark, SF).toPandas()
    long = unpivot_metrics(spark, SF).toPandas()
    for _, r in long.iterrows():
        assert wide.loc[
            wide.o_orderpriority == r.o_orderpriority, r.status
        ].iloc[0] == r.n
    # melt drops only zero cells: totals agree
    assert long.n.sum() == wide[["F", "O", "P"]].to_numpy().sum()


def test_range_frame_includes_same_second_peers(spark):
    rows = [
        (1, 10, "2024-01-01 10:00:00", 2.0),
        (2, 10, "2024-01-01 10:00:00", 4.0),  # same-second peer of 1
        (3, 10, "2024-01-01 10:30:00", 6.0),
        (4, 10, "2024-01-01 12:00:00", 8.0),  # > 1h after all others
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    got = {
        r.event_id: (r.n, r.avg)
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.avg("value").over(w).alias("avg"),
        ).collect()
    }
    # RANGE peers: rows 1 and 2 share the frame {1,2} regardless of order
    assert got[1] == (2, 3.0) and got[2] == (2, 3.0)
    assert got[3] == (3, 4.0)
    assert got[4] == (1, 8.0)  # everything else fell out of the hour


def test_corrupt_quarantine_counts_exact_slice(spark):
    from elt_data4transformation_spark.plans.events import corrupt_quarantine
    from elt_data4transformation_spark.sources import table

    SF = "/root/testdata/sf0.001"
    pdf = corrupt_quarantine(spark, SF).toPandas()
    e = table(spark, SF, "events")
    expect_bad = e.filter(F.col("event_id") % 7 == 3).count()
    assert pdf.n_quarantined.sum() == expect_bad
    assert (pdf.n_quarantined < pdf.n_total).all()


def test_orc_roundtrip_matches_parquet_source(spark):
    from elt_data4transformation_spark.plans.io_formats import orc_roundtrip
    from elt_data4transformation_spark.sources import table

    SF = "/root/testdata/sf0.001"
    pdf = orc_roundtrip(spark, SF).toPandas()
    direct = (
        table(spark, SF, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("total_bal"),
        )
        .orderBy("s_nationkey")
        .toPandas()
    )
    # int32 parquet key vs the declared long ORC schema: values equal
    import pandas.testing as pdt

    pdt.assert_frame_equal(pdf, direct, check_dtype=False)


# --- PNG codec (real image decode path) -----------------------------------


def test_png_roundtrip_exact():
    import numpy as np

    from elt_data4transformation_spark.operators import pngcodec

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (2, 7), (16, 9), (63, 31)]:
        rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        w2, h2, px = pngcodec.read_png(pngcodec.write_png(w, h, rgb))
        assert (w2, h2) == (w, h)
        assert px.tobytes() == rgb


def test_png_decoder_handles_all_filters():
    import struct
    import zlib

    import numpy as np

    from elt_data4transformation_spark.operators import pngcodec

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    rng = np.random.default_rng(5)
    w, h = 4, 5
    img = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y, f in enumerate([1, 2, 3, 4, 0]):  # one scanline per filter
        raw.append(f)
        cur = img[y]
        for x in range(w * 3):
            left = int(cur[x - 3]) if x >= 3 else 0
            up = int(prev[x])
            ul = int(prev[x - 3]) if x >= 3 else 0
            v = int(cur[x])
            if f == 0:
                e = v
            elif f == 1:
                e = (v - left) % 256
            elif f == 2:
                e = (v - up) % 256
            elif f == 3:
                e = (v - ((left + up) >> 1)) % 256
            else:
                e = (v - paeth(left, up, ul)) % 256
            raw.append(e)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w2, h2, px = pngcodec.read_png(png)
    assert (w2, h2) == (w, h)
    assert px.reshape(h, w * 3).tobytes() == img.tobytes()


def test_png_decoder_rejects_garbage():
    import pytest as _pytest

    from elt_data4transformation_spark.operators import pngcodec

    good = pngcodec.write_png(2, 2, bytes(range(12)))
    for bad in [b"", b"notapng", good[:20], good[:8] + b"\x00" * 24]:
        with _pytest.raises(ValueError):
            pngcodec.read_png(bad)
    # corrupt one IDAT byte: CRC check must catch it
    corrupted = bytearray(good)
    corrupted[40] ^= 0xFF
    with _pytest.raises((ValueError, zlib.error)):
        pngcodec.read_png(bytes(corrupted))


import zlib  # noqa: E402  (used by the PNG corruption test)


def test_wav_roundtrip_features():
    import io
    import wave

    import numpy as np

    from elt_data4transformation_spark.operators import multimodal

    d = 42
    n = multimodal.wav_n_samples(d)
    # the synthetic samples written by the encoder...
    i = np.arange(n, dtype=np.int64)
    pcm = (d * 13 + i * i * 7) % 2001 - 1000
    # ...must match the scalar reference formula
    assert [multimodal.wav_sample(d, j) for j in range(5)] == pcm[:5].tolist()
    # and survive a real stdlib WAV write/read round-trip
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(multimodal.WAV_RATE)
        wf.writeframes(pcm.astype("<i2").tobytes())
    with wave.open(io.BytesIO(buf.getvalue()), "rb") as wf:
        back = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    assert back.tolist() == pcm.tolist()


def test_png_pixel_reference_matches_encoder():
    import io  # noqa: F401

    import numpy as np

    from elt_data4transformation_spark.operators import multimodal, pngcodec

    # the scalar reference formula, the vectorized encoder, and the
    # decoder must all agree pixel-for-pixel
    d = 123
    w, h = multimodal.png_dims(d)
    x = np.arange(w)
    y = np.arange(h)[:, None]
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = (d * 7 + x * 13 + y * 31) % 256
    px[:, :, 1] = (d * 11 + x * 3 + y * 17) % 256
    px[:, :, 2] = (d * 5 + x * 29 + y * 7) % 256
    for xx, yy in [(0, 0), (w - 1, h - 1), (w // 2, h // 3)]:
        assert tuple(px[yy, xx]) == multimodal.png_pixel(d, xx, yy)
    _, _, back = pngcodec.read_png(pngcodec.write_png(w, h, px.tobytes()))
    assert back.tobytes() == px.tobytes()


def test_decode_png_features_quarantines_corrupt_payload(spark):
    from elt_data4transformation_spark.operators import multimodal, pngcodec

    good = pngcodec.write_png(2, 2, bytes(range(12)))
    df = spark.createDataFrame(
        [(1, bytearray(good), {"mime": "image/png", "n_bytes": len(good)}),
         (2, bytearray(b"corrupt"), {"mime": "image/png", "n_bytes": 7})],
        multimodal.PNG_SCHEMA,
    )
    out = {
        r.doc_id: r
        for r in multimodal.decode_png_features(df).collect()
    }
    assert out[1].width == 2 and out[1].mean_r is not None
    # bad payload -> NULL features row, stage survives
    assert out[2].width is None and out[2].mean_r is None


def test_decode_png_resize_mapping_and_quarantine(spark):
    """The NN resize picks exactly the pixels sx=(x*W)//out_w,
    sy=(y*H)//out_h (checked against a hand-built 4x2 image), and a
    corrupt payload degrades to a NULL row like the other decoders."""
    import numpy as np

    from elt_data4transformation_spark.operators import multimodal, pngcodec

    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    good = pngcodec.write_png(4, 2, px.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(good), {"mime": "image/png", "n_bytes": len(good)}),
         (2, bytearray(b"junk"), {"mime": "image/png", "n_bytes": 4})],
        multimodal.PNG_SCHEMA,
    )
    out = {
        r.doc_id: r
        for r in multimodal.decode_png_resize(df, out_w=2, out_h=1).collect()
    }
    # sx = (0*4)//2, (1*4)//2 = 0, 2 ; sy = (0*2)//1 = 0
    expected = px[np.ix_([0], [0, 2])].reshape(-1, 3).mean(axis=0)
    got = out[1]
    assert (got.width, got.height, got.out_w, got.out_h) == (4, 2, 2, 1)
    assert abs(got.mean_r - expected[0]) < 1e-9
    assert abs(got.mean_g - expected[1]) < 1e-9
    assert abs(got.mean_b - expected[2]) < 1e-9
    assert out[2].width is None and out[2].mean_r is None


def test_forward_fill_repairs_masked_values(spark):
    from elt_data4transformation_spark.plans.windows import forward_fill
    from elt_data4transformation_spark.sources import table

    SF = "/root/testdata/sf0.001"
    pdf = forward_fill(spark, SF).toPandas().set_index("event_id")
    raw = (
        table(spark, SF, "events")
        .select("event_id", "value")
        .toPandas()
        .set_index("event_id")
    )
    # non-masked rows keep their own value
    keep = [i for i in raw.index if i % 4 != 0 and i % 4 != 1][:50]
    for i in keep:
        assert abs(pdf.loc[i, "filled"] - round(raw.loc[i, "value"], 4)) < 1e-9
    # masked rows never expose their own (hidden) value unless equal by
    # chance; they are filled from a predecessor or NULL
    masked = pdf[[i % 4 == 1 for i in pdf.index]]
    assert masked["filled"].notna().sum() > 0  # fills actually happen


def test_session_window_agg_matches_cumsum_sessionize(spark):
    from elt_data4transformation_spark.plans.windows import (
        session_window_agg,
        sessionize,
    )

    SF = "/root/testdata/sf0.001"
    sw = session_window_agg(spark, SF).toPandas()
    cs = sessionize(spark, SF).toPandas()
    # same session partitioning: identical (user, n_events, start) multiset
    a = sorted(zip(sw.user_id, sw.n_events, sw.session_start))
    b = sorted(zip(cs.user_id, cs.n_events, cs.session_start))
    assert a == b


def test_levenshtein_pairs_symmetric_bounded(spark):
    from elt_data4transformation_spark.plans.cluster import (
        _LEV_MAX,
        levenshtein_titles,
    )

    pdf = levenshtein_titles(spark, "/root/testdata/sf0.001").toPandas()
    assert (pdf.doc_a < pdf.doc_b).all()
    assert (pdf.dist <= _LEV_MAX).all() and (pdf.dist >= 0).all()


def test_containment_catches_embedded_subdocument(spark):
    from elt_data4transformation_spark.operators.dedup_ops import (
        jaccard_pairs,
    )
    from pyspark.sql import functions as F
    from elt_data4transformation_spark.functions import textfns as T

    # doc 1 is fully embedded in doc 2: containment must be 1.0 while
    # jaccard is diluted by the larger side's extra grams
    small = "alpha beta gamma delta"
    big = small + " epsilon zeta eta theta iota kappa " + "x y z w v u t s"
    df = spark.createDataFrame(
        [(1, small), (2, big)], ["doc_id", "text"]
    ).select(
        "doc_id", T.word_ngrams_col(3, T.words_col()).alias("grams")
    )
    out = (
        jaccard_pairs(df, "doc_id", "grams")
        .withColumn(
            "cont",
            F.col("inter_size").cast("double") / F.least("n_a", "n_b"),
        )
        .collect()
    )
    assert len(out) == 1
    row = out[0]
    assert row["cont"] == 1.0
    assert row["jac"] < 0.2


def test_cluster_canonical_singletons_and_election(spark):
    from elt_data4transformation_spark.plans.dedup import cluster_canonical

    pdf = cluster_canonical(spark, "/root/testdata/sf0.001").toPandas()
    docs_total = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    # every document lands in exactly one component
    assert pdf.n_members.sum() == docs_total
    # canonical is a member, so its tokens are never counted as removed
    assert (pdf.tokens_removed <= pdf.tokens_total).all()
    singles = pdf[pdf.n_members == 1]
    assert (singles.component == singles.canonical_doc_id).all()
    assert (singles.tokens_removed == 0).all()
    assert ((pdf.canonical_quality >= 0) & (pdf.canonical_quality <= 1)).all()


def test_bigram_lm_counts_repeats_and_true_conditionals(spark):
    from elt_data4transformation_spark.plans.text import (
        _LM_MIN_COUNT,
        _LM_TOP_K,
        bigram_lm,
    )

    pdf = bigram_lm(spark, "/root/testdata/sf0.001").toPandas()
    assert (pdf.pair_n >= _LM_MIN_COUNT).all()
    assert (pdf.rnk <= _LM_TOP_K).all()
    # prob is a true conditional: pair_n / ctx_n, and ctx_n counts ALL
    # continuations (so the per-context probs kept may sum below 1 but
    # each equals its ratio exactly at 6dp)
    import numpy as np

    assert np.allclose(pdf.prob, (pdf.pair_n / pdf.ctx_n).round(6))
    assert (pdf.ctx_n >= pdf.pair_n).all()


def test_winnow_fingerprints_density_and_dup_invariance(spark):
    """Winnowing density sits in its theoretical band (>= 1/w, around
    2/(w+1)), and — the guarantee that matters — documents with
    IDENTICAL text get identical fingerprint summaries."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.dedup import (
        _WIN_W,
        winnow_fingerprints,
    )

    sf = "/root/testdata/sf0.001"
    pdf = winnow_fingerprints(spark, sf).toPandas()
    assert (pdf.density >= 1.0 / _WIN_W - 1e-9).all()
    assert (pdf.density <= 1.0).all()
    assert abs(pdf.density.mean() - 2.0 / (_WIN_W + 1)) < 0.15
    # the winnowing GUARANTEE: docs sharing a substring >= k + w - 1
    # chars share at least one selected fingerprint — exercised on a
    # crafted frame where only a 16-char span is common
    from elt_data4transformation_spark.operators.dedup_ops import (
        winnow_select,
    )

    shared = "the shared span!"  # 16 >= 8 + 4 - 1
    crafted = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc " + shared + " dddd eeee"),
            (2, "zzzz yyyy " + shared + " xxxx wwww vvvv uuuu"),
            (3, "totally unrelated content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    sel = winnow_select(crafted, "doc_id", "text").toPandas()
    fps = {i: set(g.fp_hash) for i, g in sel.groupby("doc_id")}
    assert fps[1] & fps[2], "shared span produced no shared fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3])


def test_winnow_positions_match_pure_python_reference(spark):
    """Pin the in-array sliding-min rewrite of _winnow_keys to a
    row-by-row pure-Python winnowing reference: exact per-window
    argmin with rightmost tie-break (the packed-key integer
    semantics), on texts engineered to contain hash ties (repeated
    grams) and short-doc edge lengths around k + w - 1."""
    import hashlib

    from elt_data4transformation_spark.operators.dedup_ops import (
        winnow_positions,
    )

    k, w, m = 8, 4, 1 << 20
    texts = {
        1: "ababababababababababab",  # heavy gram repetition -> ties
        2: "the quick brown fox jumps over the lazy dog",
        3: "exactly11ch",  # len 11 == k + w - 1: one window
        4: "shortdoc",  # len 8 < k + w - 1: must be dropped
        5: "x" * 30,  # a single repeated gram everywhere
    }

    def ref_rows(doc_id: int, t: str):
        n = len(t)
        if n < k + w - 1:
            return set()
        np_ = n - k + 1
        keys = []
        for p in range(1, np_ + 1):
            h = int(hashlib.md5(t[p - 1 : p - 1 + k].encode()).hexdigest()[:8], 16)
            keys.append(h * m + (m - 1 - p))
        out = set()
        for i in range(np_ - w + 1):
            sk = min(keys[i : i + w])
            out.add((doc_id, np_, m - 1 - sk % m, sk // m))
        return out

    expected = set()
    for i, t in texts.items():
        expected |= ref_rows(i, t)
    crafted = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.np, r.p, r.fp_hash)
        for r in winnow_positions(crafted, "doc_id", "text", k, w, m).collect()
    }
    assert got == expected


def test_leakage_safe_split_keeps_components_together(spark):
    """The group-aware split's whole point: every near-dup component
    lands in exactly one split, the assignment covers all docs exactly
    once, and grouped docs share their component's split."""
    from elt_data4transformation_spark.plans.dedup import (
        dedup_components,
        leakage_safe_split,
    )

    sf = "/root/testdata/sf0.001"
    split = leakage_safe_split(spark, sf).toPandas()
    comps = dedup_components(spark, sf).toPandas()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(split) == n_docs
    assert split.doc_id.is_unique
    assert (split.groupby("group_id")["split"].nunique() == 1).all()
    # docs that are in a component must be grouped under that component
    merged = split.merge(comps, on="doc_id", how="inner")
    assert len(merged) == len(comps)
    assert (merged.group_id == merged.component).all()
    assert set(split.split.unique()) <= {"train", "val", "test"}


def test_substring_dup_spans_are_maximal_and_in_bounds(spark):
    """Spans lie inside their document, are >= the anchor window, never
    overlap, and truly maximal: consecutive spans of a doc are separated
    by more than one char (else the island merge would have fused them).
    Every span's text must occur in at least one OTHER document."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.dedup import (
        _SUB_K,
        substring_dup_spans,
    )

    sf = "/root/testdata/sf0.001"
    pdf = substring_dup_spans(spark, sf).toPandas()
    assert len(pdf) > 0
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")["text"]
    )
    assert (pdf.span_len >= _SUB_K).all()
    assert (pdf.span_len == pdf.span_end - pdf.span_start + 1).all()
    assert (pdf.n_anchors >= 1).all()
    assert (pdf.n_anchors <= pdf.span_len - _SUB_K + 1).all()
    for doc_id, grp in pdf.groupby("doc_id"):
        assert grp.span_end.max() <= len(docs[doc_id])
        g = grp.sort_values("span_start")
        gaps = g.span_start.iloc[1:].values - g.span_end.iloc[:-1].values
        assert (gaps > 1).all(), f"doc {doc_id}: mergeable spans survived"
    # cross-doc check on the smallest span: its anchor-window prefix
    # must appear verbatim in some other document
    row = pdf.sort_values("span_len").iloc[0]
    frag = docs[row.doc_id][row.span_start - 1 : row.span_start - 1 + _SUB_K]
    assert any(
        frag in t for i, t in docs.items() if i != row.doc_id
    ), "span fragment not found in any other doc"


def test_substring_dup_spans_gated_equals_raw(spark):
    """The stored-probe variant (winnow shared-doc prefilter, round 11)
    must return EXACTLY the rows of the raw end-to-end query: the
    winnowing guarantee at k+w-1 = _SUB_K makes the prefilter a strict
    superset of every doc with a cross-doc repeat, and fp collisions
    only add candidates the exact gram aggregate re-checks. Any
    divergence means the gate dropped a true span."""
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    raw = REGISTRY["substring_dup_spans"].fn(spark, SF_SMALL).collect()
    gated = (
        REGISTRY["substring_dup_spans_gated"].fn(spark, SF_SMALL).collect()
    )
    assert [tuple(r) for r in gated] == [tuple(r) for r in raw]


def test_doc_perplexity_bounds_and_bigram_count(spark):
    """Perplexity under the self-trained smoothed bigram LM is bounded
    by the smoothed-uniform worst case, and n_bigrams == len(words)-1
    for every scored doc."""
    import numpy as np
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.text import doc_perplexity

    sf = "/root/testdata/sf0.001"
    pdf = doc_perplexity(spark, sf).toPandas()
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    assert (pdf.perplexity > 1.0).all()
    assert (pdf.cross_entropy > 0).all()
    # every pair the scorer sees came from the training corpus, so
    # P >= (1 + k) / (max_ctx + k*V) — a crude but engine-free bound:
    # perplexity can never exceed the unsmoothed-uniform vocab size
    # times the smoothing inflation factor
    vocab = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert (pdf.perplexity < 4 * vocab).all()
    assert np.allclose(pdf.perplexity, np.exp(pdf.cross_entropy).round(4))
    for _, row in pdf.iterrows():
        assert row.n_bigrams == docs[row.doc_id] - 1


def test_chunk_documents_overlap_and_coverage(spark):
    from elt_data4transformation_spark.plans.corpus import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        chunk_documents,
    )
    from pyspark.sql import functions as F

    pdf = chunk_documents(spark, "/root/testdata/sf0.001").toPandas()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.length("text") > 0)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    # chunk starts advance by the stride and cover every word
    for doc_id, grp in pdf.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        assert (grp.start_word.diff().dropna() == _CHUNK_STRIDE).all()
        n = docs[doc_id]
        last = grp.iloc[-1]
        assert last.start_word + last.n_tokens - 1 == n
        assert (grp.n_tokens <= _CHUNK_SIZE).all()
        assert (grp.n_tokens >= 1).all()


def test_token_entropy_bounds_and_degenerates(spark):
    import numpy as np

    from elt_data4transformation_spark.plans.corpus import token_entropy

    pdf = token_entropy(spark, "/root/testdata/sf0.001").toPandas()
    # entropy within [0, log2(n_distinct)]; normalized within [0, 1]
    assert (pdf.entropy >= 0).all()
    assert (
        pdf.entropy <= np.log2(pdf.n_distinct).round(4) + 1e-9
    ).all()
    ok = pdf.norm_entropy.dropna()
    assert ((ok >= 0) & (ok <= 1.0 + 1e-9)).all()
    # uniform-ish sanity: a doc of all-distinct tokens has H = log2(n)
    uni = pdf[pdf.n_distinct == pdf.n_tokens]
    if len(uni):
        assert np.allclose(
            uni.entropy, np.log2(uni.n_tokens).round(4), atol=1e-3
        )


def test_stream_stream_left_outer_null_release(spark, tmp_path):
    """Left-outer nulls must be released by watermark advancement, not
    batch boundaries: the multi-batch run (4 time-ordered files,
    maxFilesPerTrigger=1) emits the same matched AND null-purchase
    rows as the single-batch run."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.streaming.events import (
        stream_stream_view_purchase_outer,
    )

    src = str(tmp_path / "multi_outer")
    ev_all = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).withColumn("_t", F.col("ts").cast("timestamp").cast("double"))
    qs = ev_all.approxQuantile("_t", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    for i in range(4):
        part = ev_all.filter(
            (F.col("_t") > bounds[i]) & (F.col("_t") <= bounds[i + 1])
        ).drop("_t")
        part.coalesce(1).write.mode("append").parquet(src)

    def run(sf_dir, glob, mfpt):
        out = stream_stream_view_purchase_outer(
            spark, sf_dir, glob=glob, max_files_per_trigger=mfpt
        )
        return {tuple(r) for r in out.collect()}

    single = run("/root/testdata/sf0.001", "events.parquet", None)
    multi = run(src, "*.parquet", 1)
    assert multi == single
    # non-vacuous: fixture must exercise both match and null paths
    assert any(r[2] is not None for r in single)
    assert any(r[2] is None for r in single)


def test_cdc_aggregate_maintain_equals_recompute(spark):
    """The maintained (base + deltas) aggregate must equal a from-
    scratch recompute of the final state — differential, same engine,
    independent of the DuckDB oracle."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.upserts import (
        T1,
        cdc_aggregate_maintain,
    )

    sf = "/root/testdata/sf0.001"
    maintained = (
        cdc_aggregate_maintain(spark, sf)
        .select("event_type", "n_rows", "total_value")
        .toPandas()
        .set_index("event_type")
    )
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id",
        "event_type",
        "value",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    base = e.filter(F.col("ts") < F.lit(T1).cast("timestamp"))
    post = e.filter(F.col("ts") >= F.lit(T1).cast("timestamp"))
    live = base.unionByName(post.filter(F.col("event_id") % 10 != 0))
    del_ids = post.filter(F.col("event_id") % 10 == 0).select(
        (F.col("event_id") - 10).alias("event_id")
    )
    final = live.join(del_ids, "event_id", "left_anti")
    recomputed = (
        final.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .toPandas()
        .set_index("event_type")
    )
    assert set(maintained.index) == set(recomputed.index)
    for et in maintained.index:
        assert maintained.loc[et, "n_rows"] == recomputed.loc[et, "n_rows"]
        assert (
            abs(
                maintained.loc[et, "total_value"]
                - recomputed.loc[et, "total_value"]
            )
            < 1e-6
        )


def test_bpe_merges_greedy_overlap_and_monotone(spark):
    """BPE invariants on the fixture: merged symbols concatenate their
    pair, pair counts never increase as merges consume pairs, and the
    'a a a' overlap resolves left-to-right greedily (via the literal
    space-delimited replace both engines share)."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.text import bpe_merges

    pdf = bpe_merges(spark, "/root/testdata/sf0.001").toPandas()
    assert list(pdf.step) == list(range(len(pdf)))
    for _, r in pdf.iterrows():
        a, b = r["pair"].split(" ")
        assert r["merged"] == a + b
        assert r["pair_count"] > 0
    # greedy-overlap unit check on the shared replace semantics
    out = spark.sql(
        "SELECT TRIM(REPLACE(' a a a ', ' a a ', ' aa ')) AS s"
    ).collect()[0]["s"]
    assert out == "aa a"


def test_bpe_encode_compresses_vs_chars(spark):
    """Encoding invariants: bpe tokens per word >= 1, strictly fewer
    symbols than characters+eow once merges applied (for any doc whose
    words hit the merged pairs), and ws_tokens matches the split."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.text import bpe_encode

    pdf = bpe_encode(spark, "/root/testdata/sf0.001").toPandas()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_words"),
            (F.length("text") + F.size(F.split("text", " "))).alias(
                "chars_plus_eow"
            ),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert len(pdf) == len(docs)
    merged = pdf.set_index("doc_id").join(docs)
    assert (merged.ws_tokens == merged.n_words).all()
    # every word contributes >= 1 symbol; char-seq + eow is the ceiling
    assert (merged.bpe_tokens >= merged.ws_tokens).all()
    assert (merged.bpe_tokens <= merged.chars_plus_eow).all()
    # merges actually fired somewhere
    assert (merged.bpe_tokens < merged.chars_plus_eow).any()


def test_quality_col_empty_text_no_nan_and_engines_agree(spark):
    """Empty text must never produce NaN (NaN sorts above every real
    quality in a descending election — cluster_canonical would
    silently crown an empty doc) and both engines must yield the SAME
    finite value. The NULLIF guard turns Spark's 0/0 punct ratio into
    NULL, which LEAST then skips identically on both engines."""
    import math

    import duckdb

    from elt_data4transformation_spark.functions.textfns import (
        quality_col,
        quality_sql,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "real words here and the of a")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", quality_col().alias("q")).collect()
    }
    assert got[1] is not None and not math.isnan(got[1])
    assert got[2] is not None and not math.isnan(got[2])
    empty_lit = "''"
    duck = duckdb.sql(f"SELECT {quality_sql(empty_lit)} AS q").fetchone()[0]
    assert duck is not None and not math.isnan(duck)
    assert abs(duck - got[1]) < 1e-12


def test_ann_pq_recall_vs_exact_l2(spark):
    """PQ top-k must overlap substantially with exact L2 top-k (the
    whole point of the compact code): recall@5 >= 0.5 on the fixture,
    and codes are within [0, PQ_K)."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.similarity import (
        N_QUERIES,
        TOP_K,
        ann_pq_topk,
        _vectors,
    )

    sf = "/root/testdata/sf0.01"
    pq = ann_pq_topk(spark, sf).toPandas()
    assert set(pq.query_id.unique()) == set(range(N_QUERIES))
    assert pq.groupby("query_id").size().eq(TOP_K).all()

    e = _vectors(spark, sf).select("vec_id", "v")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    l2 = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), "vec_id")
    exact = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", l2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .toPandas()
    )
    hits = 0
    for qid in range(N_QUERIES):
        got = set(pq[pq.query_id == qid].neighbor_id)
        truth = set(exact[exact.query_id == qid].vec_id)
        hits += len(got & truth)
    recall = hits / (N_QUERIES * TOP_K)
    assert recall >= 0.5, f"PQ recall@{TOP_K} too low: {recall}"

    # two-stage serving shape: exact re-rank of the ADC shortlist must
    # recover what quantization blurs — recall@5 >= 0.9 (a true top-k
    # neighbor is lost only if it misses the whole top-50 shortlist)
    from elt_data4transformation_spark.plans.similarity import (
        ann_pq_rerank,
    )

    rr = ann_pq_rerank(spark, sf).toPandas()
    assert rr.groupby("query_id").size().eq(TOP_K).all()
    hits = 0
    for qid in range(N_QUERIES):
        got = set(rr[rr.query_id == qid].neighbor_id)
        truth = set(exact[exact.query_id == qid].vec_id)
        hits += len(got & truth)
    rr_recall = hits / (N_QUERIES * TOP_K)
    assert rr_recall >= 0.9, (
        f"PQ re-rank recall@{TOP_K} too low: {rr_recall} (ADC {recall})"
    )


def test_media_decode_quarantines_all_failure_classes(spark):
    """One bad payload must NEVER kill a decode stage: truncated-IDAT
    PNGs (zlib.error with valid per-chunk CRCs), non-PNG mimes
    (NotImplementedError), corrupt RIFF and zero-rate WAVs all land as
    NULL-feature rows."""
    import io
    import struct
    import wave
    import zlib

    from elt_data4transformation_spark.operators import pngcodec
    from elt_data4transformation_spark.operators.multimodal import (
        PNG_SCHEMA,
        decode_png_features,
        decode_wav_features,
    )

    # CRC-valid truncated PNG: rebuild with only the first IDAT bytes
    good = pngcodec.write_png(4, 4, bytes(48))

    def chunks(b):
        i = 8
        while i < len(b):
            (ln,) = struct.unpack(">I", b[i : i + 4])
            typ = b[i + 4 : i + 8]
            yield typ, b[i + 8 : i + 8 + ln]
            i += 12 + ln

    def chunk(typ, data):
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)

    parts = dict(chunks(good))
    truncated = (
        good[:8]
        + chunk(b"IHDR", parts[b"IHDR"])
        + chunk(b"IDAT", parts[b"IDAT"][: len(parts[b"IDAT"]) // 2])
        + chunk(b"IEND", b"")
    )
    rows = [
        (1, truncated, {"mime": "image/png", "n_bytes": len(truncated)}),
        (2, good, {"mime": "video/mp4", "n_bytes": len(good)}),
        (3, good, {"mime": "image/png", "n_bytes": len(good)}),
    ]
    out = {
        r["doc_id"]: r
        for r in decode_png_features(
            spark.createDataFrame(rows, PNG_SCHEMA)
        ).collect()
    }
    assert out[1]["width"] is None  # truncated IDAT quarantined
    assert out[2]["width"] is None  # non-PNG mime quarantined
    assert out[3]["width"] == 4  # good row still decodes

    # WAV: garbage payload + zero-framerate payload quarantined
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x01\x00\x02\x00")
    wav_rows = [
        (1, b"not a wav at all", {"mime": "audio/wav", "n_bytes": 16}),
        (2, buf.getvalue(), {"mime": "audio/wav", "n_bytes": 44}),
    ]
    wout = {
        r["doc_id"]: r
        for r in decode_wav_features(
            spark.createDataFrame(wav_rows, PNG_SCHEMA)
        ).collect()
    }
    assert wout[1]["n_samples"] is None
    assert wout[2]["n_samples"] == 2


# --- round-4 ADVICE fixes -------------------------------------------------


def test_jaccard_pairs_capped_rescore_is_block_scoped(spark):
    """With max_df set, the exact rescore must join candidates back on
    (block, id), not bare id: ids here repeat across blocks (the very
    scenario block_col exists for), and an id-only join would fan out
    and mis-score every pair."""
    sets = spark.createDataFrame(
        [
            # block g: ids 1,2 similar; block h REUSES ids 1,2 with
            # entirely different (and differently-sized) sets
            (1, ["hot", "a", "b"], "g"),
            (2, ["hot", "a", "c"], "g"),
            (1, ["hot", "x", "y", "z", "w"], "h"),
            (2, ["hot", "x", "q"], "h"),
        ],
        "id long, s array<string>, blk string",
    )
    uncapped = {
        (r["block"], r["doc_a"], r["doc_b"]): (r["jac"], r["inter_size"])
        for r in dedup_ops.jaccard_pairs(sets, "id", "s", "blk").collect()
    }
    capped = {
        (r["block"], r["doc_a"], r["doc_b"]): (r["jac"], r["inter_size"])
        for r in dedup_ops.jaccard_pairs(
            sets, "id", "s", "blk", max_df=10
        ).collect()
    }
    # cap above every df -> candidate sets identical; scores must be too
    assert capped == uncapped
    assert capped[("g", 1, 2)][1] == 2  # {hot, a}
    assert capped[("h", 1, 2)][1] == 2  # {hot, x}


def test_missized_vector_quarantine_uses_mode_dim(spark):
    """A single oversized corrupt vector must be the row quarantined —
    not (by defining the expected dim as max size) every valid row."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.001]),
        (2, [0.9, 0.01]),
        (3, [1.0, 0.0, 0.0, 0.0]),  # corrupt: one oversized outlier
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in vectors.cosine_pairs(
            df, "vec_id", "v", threshold=0.9, expected_dim=None
        ).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}
    bucketed = df.withColumn("bk", F.lit("all"))
    got_b = {
        (r["id_a"], r["id_b"])
        for r in vectors.bucket_cosine_pairs(
            bucketed, "bk", "vec_id", "v", threshold=0.9
        ).collect()
    }
    assert got_b == {(0, 1), (0, 2), (1, 2)}


def test_dqcheck_spec_validation():
    from elt_data4transformation_spark.operators.dq import (
        DQCheck,
        _row_cond_sql,
        dq_report,
    )

    with pytest.raises(ValueError, match="at least one of lo/hi"):
        DQCheck("t", "accepted_range", ("v",))
    with pytest.raises(ValueError, match="empty allow-list"):
        DQCheck("t", "accepted_values", ("v",))
    with pytest.raises(ValueError, match="to_table and to_column"):
        DQCheck("t", "relationships", ("v",))
    with pytest.raises(ValueError, match="unknown DQ check kind"):
        DQCheck("t", "no_such_kind", ("v",))
    with pytest.raises(ValueError, match="at least one column"):
        DQCheck("t", "not_null", ())
    with pytest.raises(ValueError, match="empty check list"):
        dq_report({}, {}, ())
    # numeric allow-lists render as typed literals, not varchar
    sql = _row_cond_sql(DQCheck("t", "accepted_values", ("v",), values=(1, 2)))
    assert "IN (1, 2)" in sql
    sql = _row_cond_sql(
        DQCheck("t", "accepted_values", ("v",), values=("a", "b"))
    )
    assert "IN ('a', 'b')" in sql


def test_stored_artifact_rebuilds_on_cardinality_preserving_edit(
    spark, tmp_path
):
    """The round-3 latent wrong-answer path, closed: an edit to the
    corpus that PRESERVES row count must invalidate the stored index
    (the old count-keyed fingerprint reused it). The artifact is
    stamped with a file-level source fingerprint, so the edit triggers
    a rebuild and the probe reflects the new corpus; an untouched
    corpus still reuses the artifact byte-for-byte."""
    import os
    import shutil

    from elt_data4transformation_spark.operators import artifacts
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.dedup import _index_root
    from tests.conftest import SF_SMALL

    sf = str(tmp_path / "sfcopy")
    os.makedirs(sf)
    shutil.copy(os.path.join(SF_SMALL, "documents.parquet"), sf)
    fn = REGISTRY["dedup_stored_index"].fn
    first = [tuple(r) for r in fn(spark, sf).collect()]
    spark.catalog.clearCache()
    path = os.path.join(_index_root(), "sfcopy")
    meta1 = artifacts.load_meta(path)
    assert meta1 is not None

    # same-cardinality edit: corpus doc 1 (doc_id % 5 != 0) becomes a
    # near-copy of delta doc 5's text -> a NEW match must appear
    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    t5 = d.filter(F.col("doc_id") == 5).head()["text"]
    edited = d.withColumn(
        "text",
        F.when(F.col("doc_id") == 1, F.lit(t5 + " tail")).otherwise(
            F.col("text")
        ),
    )
    edited.toPandas().to_parquet(os.path.join(sf, "documents.parquet"))
    assert spark.read.parquet(
        os.path.join(sf, "documents.parquet")
    ).count() == d.count()

    second = [tuple(r) for r in fn(spark, sf).collect()]
    meta2 = artifacts.load_meta(path)
    assert meta2["fingerprint"] != meta1["fingerprint"], (
        "cardinality-preserving edit did not rebuild the stored index"
    )
    pairs2 = {(r[0], r[1]) for r in second}
    assert (5, 1) in pairs2, "probe missed the post-edit near-dup"
    assert first != second


def test_merge_band_index_three_invocation_lifecycle(spark, tmp_path):
    """Ingest lifecycle across three invocations: (1) index the base
    corpus, (2) probe ingest A then MERGE it, (3) probe ingest B —
    B must match against A's documents (the merge is what makes that
    possible), purely from stored artifacts (corpus deleted), with the
    base segment untouched and a new ingest segment beside it."""
    import json
    import os
    import shutil

    from elt_data4transformation_spark.operators import artifacts

    base_text = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the spark engine shuffles partitions across the cluster"
    )
    a_text = (
        "completely fresh material arriving in ingest batch a with "
        "distinctive vocabulary shared by nothing in the base corpus"
    )
    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        [(1, base_text), (2, "unrelated words only here nothing shared")],
        "doc_id long, text string",
    ).write.parquet(corpus_path)

    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(spark.read.parquet(corpus_path), idx)
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "base", "ingests": []}, fh)
    shutil.rmtree(corpus_path)  # stored artifacts are all that remain

    def snapshot(p):
        return {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(p)
            for f in fs
        }

    base_files = {
        k: v for k, v in snapshot(idx).items() if "_ingest_" not in k
    }

    # invocation 2: probe A (near-dup of base doc 1 + novel doc), merge
    ingest_a = spark.createDataFrame(
        [(100, base_text.replace("lazy", "sleepy")), (101, a_text)],
        "doc_id long, text string",
    )
    got_a = {
        (r["new_doc_id"], r["matched_doc_id"])
        for r in dedup_ops.probe_band_index(
            spark, idx, ingest_a, threshold=0.5
        ).collect()
    }
    assert got_a == {(100, 1)}  # novel doc 101 matches nothing yet
    dedup_ops.merge_band_index(spark, idx, ingest_a, tag="a")
    artifacts.update_meta(idx, "base+a", {"ingests": ["a"]})

    # artifact GREW: base segment byte-identical, new segment added
    after = snapshot(idx)
    assert {
        k: v for k, v in after.items()
        if "_ingest_" not in k and artifacts.META_NAME not in k
    } == {k: v for k, v in base_files.items() if artifacts.META_NAME not in k}
    assert any("bands_ingest_a" in k for k in after)
    assert any("shingles_ingest_a" in k for k in after)

    # invocation 3: ingest B near-dups A's novel doc — only the merge
    # makes this match possible
    ingest_b = spark.createDataFrame(
        [(200, a_text.replace("distinctive", "distinct"))],
        "doc_id long, text string",
    )
    got_b = {
        (r["new_doc_id"], r["matched_doc_id"])
        for r in dedup_ops.probe_band_index(
            spark, idx, ingest_b, threshold=0.5
        ).collect()
    }
    assert got_b == {(200, 101)}, "ingest B did not see merged ingest A"

    # orphan segment from a crashed merge (not in meta) is ignored
    dedup_ops.merge_band_index(spark, idx, ingest_b, tag="crashed")
    got_b2 = {
        (r["new_doc_id"], r["matched_doc_id"])
        for r in dedup_ops.probe_band_index(
            spark, idx, ingest_b, threshold=0.5
        ).collect()
    }
    assert got_b2 == got_b


def test_winnowed_spans_detection_guarantee(spark, tmp_path):
    """Winnowing guarantee wired into span dedup: a repeat of exactly
    K + W - 1 = 40 chars MUST be detected (>= 1 shared selected
    anchor), and every reported span must lie inside the true shared
    region of its document."""
    import os
    import random

    from elt_data4transformation_spark.plans import REGISTRY

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def rnd(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    shared = rnd(40)
    pre1, pre2 = rnd(60), rnd(35)
    docs = [
        (1, pre1 + shared + rnd(50)),
        (2, pre2 + shared + rnd(70)),
        (3, rnd(120)),  # no repeat: must produce no span
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id long, text string").toPandas(
    ).to_parquet(os.path.join(sf, "documents.parquet"))

    spans = REGISTRY["substring_dup_spans_winnowed"].fn(spark, sf).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 in by_doc and 2 in by_doc and 3 not in by_doc
    regions = {1: (len(pre1) + 1, len(pre1) + 40), 2: (len(pre2) + 1, len(pre2) + 40)}
    for doc, (lo, hi) in regions.items():
        for r in by_doc[doc]:
            assert lo <= r["span_start"] <= r["span_end"] <= hi, (
                f"doc {doc}: span [{r['span_start']},{r['span_end']}] "
                f"outside shared region [{lo},{hi}]"
            )


def test_srp_recall_vs_exact(spark):
    """embedding_neardup_srp must recover nearly all TRUE pairs at its
    operating point: ground truth = exact all-pairs cosine >= 0.9 over
    base + deterministic twins (numpy), recall asserted >= 0.95, zero
    false positives (the exact rescore guarantees precision 1.0)."""
    import numpy as np
    import pandas as pd

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.dedup import (
        _SRP_DIM,
        _SRP_TAU,
        _SRP_TWIN_N,
    )
    from tests.conftest import SF_SMALL

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    tw_mask = ids < _SRP_TWIN_N
    tw = np.round(
        0.9 * m[tw_mask] + 0.1 * np.roll(m[tw_mask], -1, axis=1), 6
    )
    all_ids = np.concatenate([ids, ids[tw_mask] + 100000])
    all_v = np.vstack([m, tw])
    nrm = all_v / np.linalg.norm(all_v, axis=1, keepdims=True)
    sims = np.round(nrm @ nrm.T, 6)
    ia, ib = np.triu_indices(len(all_ids), k=1)
    hit = sims[ia, ib] >= _SRP_TAU
    truth = {
        (min(a, b), max(a, b))
        for a, b in zip(all_ids[ia[hit]], all_ids[ib[hit]])
    }
    assert len(truth) >= 50  # the twins create a real positive set

    got = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["embedding_neardup_srp"].fn(
            spark, SF_SMALL
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"SRP recall {recall:.3f} < 0.95"
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    assert _SRP_DIM == 64


def test_compact_band_index_folds_segments(spark, tmp_path):
    """Compaction folds base + ingest segments into one new base:
    probe results are IDENTICAL before and after, the ingests list
    clears, the fingerprint is untouched (same logical content), and
    the segment directories are gone. Compacting a segment-free index
    is a no-op."""
    import json
    import os

    from elt_data4transformation_spark.operators import artifacts

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    t2 = "one two three four five six seven eight nine ten eleven " * 3
    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(
        spark.createDataFrame([(1, t1)], "doc_id long, text string"), idx
    )
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "fp0", "ingests": []}, fh)
    assert dedup_ops.compact_band_index(spark, idx) is False  # no-op

    dedup_ops.merge_band_index(
        spark,
        idx,
        spark.createDataFrame([(2, t2)], "doc_id long, text string"),
        tag="a",
    )
    artifacts.update_meta(idx, "fp0", {"ingests": ["a"]})

    probe = spark.createDataFrame(
        [(10, t1.replace("beta", "betb")), (11, t2.replace("two", "twa"))],
        "doc_id long, text string",
    )
    before = sorted(
        tuple(r)
        for r in dedup_ops.probe_band_index(spark, idx, probe).collect()
    )
    assert {p[:2] for p in before} == {(10, 1), (11, 2)}

    assert dedup_ops.compact_band_index(spark, idx) is True
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == [] and meta["fingerprint"] == "fp0"
    assert not any("_ingest_" in d for d in os.listdir(idx))
    after = sorted(
        tuple(r)
        for r in dedup_ops.probe_band_index(spark, idx, probe).collect()
    )
    assert after == before


def test_delete_from_band_index_lifecycle(spark, tmp_path):
    """Tombstone DELETE lifecycle: (1) index a base corpus and merge an
    ingest segment — probes match docs in both; (2) tombstone one base
    doc and the ingested doc — probes no longer surface EITHER (the
    anti-join covers every segment), while untouched docs still match
    and no data segment was rewritten; an ORPHAN tombstone not listed
    in the meta is ignored; (3) compaction applies the tombstones
    physically — probe-identical, deletes list cleared, tombstone and
    ingest dirs gone, the shingle table physically shrunk."""
    import json
    import os

    from elt_data4transformation_spark.operators import artifacts

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    t2 = "one two three four five six seven eight nine ten eleven " * 3
    t3 = "red orange yellow green blue indigo violet colors rainbow " * 3
    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(
        spark.createDataFrame(
            [(1, t1), (2, t2)], "doc_id long, text string"
        ),
        idx,
    )
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "fp0", "ingests": []}, fh)
    dedup_ops.merge_band_index(
        spark,
        idx,
        spark.createDataFrame([(3, t3)], "doc_id long, text string"),
        tag="a",
    )
    artifacts.update_meta(idx, "fp0", {"ingests": ["a"]})

    probe = spark.createDataFrame(
        [
            (10, t1.replace("beta", "betb")),
            (11, t2.replace("two", "twa")),
            (12, t3),  # exact dup: band collision certain, not LSH luck
        ],
        "doc_id long, text string",
    )

    def matches():
        return {
            (r["new_doc_id"], r["matched_doc_id"])
            for r in dedup_ops.probe_band_index(spark, idx, probe).collect()
        }

    assert matches() == {(10, 1), (11, 2), (12, 3)}

    # takedown: doc 2 (base segment) and doc 3 (ingest segment)
    dedup_ops.delete_from_band_index(
        spark,
        idx,
        spark.createDataFrame([(2,), (3,)], "doc_id long"),
        tag="d",
    )
    artifacts.update_meta(idx, "fp0", {"ingests": ["a"], "deletes": ["d"]})
    assert matches() == {(10, 1)}, "tombstoned docs still match probes"

    # an orphan tombstone (crashed delete, not in meta) must be ignored
    dedup_ops.delete_from_band_index(
        spark,
        idx,
        spark.createDataFrame([(1,)], "doc_id long"),
        tag="crashed",
    )
    assert matches() == {(10, 1)}

    # compaction applies the listed tombstones physically
    assert dedup_ops.compact_band_index(spark, idx) is True
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == [] and meta["deletes"] == []
    assert not any(
        d.startswith(("deletes_", "bands_ingest_", "shingles_ingest_"))
        for d in os.listdir(idx)
    )
    assert matches() == {(10, 1)}
    left = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx}/shingles").collect()
    }
    assert left == {1}, f"compaction did not reclaim deleted rows: {left}"


def test_ann_nprobe_recall_at_least_single_probe(spark):
    """nprobe=2 must dominate nprobe=1: every nprobe=1 bucket is also
    searched, so recall vs brute force can only go up — the knob's
    whole point."""
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].fn(spark, SF_SMALL).collect()
    }
    one = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_topk"].fn(spark, SF_SMALL).collect()
    }
    two = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_nprobe"].fn(spark, SF_SMALL).collect()
    }
    r1 = len(bf & one) / len(bf)
    r2 = len(bf & two) / len(bf)
    assert r2 >= r1, f"nprobe=2 recall {r2:.3f} < nprobe=1 {r1:.3f}"
    assert r2 >= 0.8


def test_artifacts_publish_protocol(tmp_path):
    """publish(): a meta-less directory is a partial build and never
    trusted; current artifacts are reused untouched; a concurrent
    winner makes the loser discard its temp build; stale artifacts are
    atomically replaced with no temp/old residue."""
    import os

    from elt_data4transformation_spark.operators import artifacts

    path = str(tmp_path / "art")
    os.makedirs(path)
    with open(os.path.join(path, "data"), "w") as fh:
        fh.write("partial")
    assert artifacts.load_meta(path) is None  # no meta == absent

    def builder(content):
        def b(tmp):
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "data"), "w") as fh:
                fh.write(content)
        return b

    assert artifacts.publish(path, "fp1", builder("v1")) is True
    assert artifacts.is_current(path, "fp1")
    assert open(os.path.join(path, "data")).read() == "v1"
    assert artifacts.publish(path, "fp1", builder("BOOM")) is False
    assert open(os.path.join(path, "data")).read() == "v1"  # reused

    def racing(tmp):
        builder("loser")(tmp)
        artifacts.update_meta(path, "fp2")  # another builder finishes

    assert artifacts.publish(path, "fp2", racing) is False
    assert open(os.path.join(path, "data")).read() == "v1"

    assert artifacts.publish(path, "fp3", builder("v3")) is True
    assert open(os.path.join(path, "data")).read() == "v3"
    residue = [
        d for d in os.listdir(str(tmp_path)) if ".tmp." in d or ".old." in d
    ]
    assert residue == []


def test_artifacts_sweep_orphans_age_gated(tmp_path):
    """Crash debris (.tmp./.old. dirs) is collected only past the age
    gate — a concurrent builder's LIVE temp dir (recent mtime) is
    never touched."""
    import os
    import time

    from elt_data4transformation_spark.operators import artifacts

    path = str(tmp_path / "art")
    old_tmp = str(tmp_path / "art.tmp.deadbeef")
    old_old = str(tmp_path / "art.old.cafebabe")
    live_tmp = str(tmp_path / "art.tmp.12345678")
    for d in (old_tmp, old_old, live_tmp):
        os.makedirs(d)
    stale = time.time() - artifacts.ORPHAN_AGE_S - 60
    os.utime(old_tmp, (stale, stale))
    os.utime(old_old, (stale, stale))

    assert artifacts.sweep_orphans(path) == 2
    assert not os.path.exists(old_tmp) and not os.path.exists(old_old)
    assert os.path.exists(live_tmp)  # recent == possibly live, kept

    # publish sweeps opportunistically and still builds correctly
    os.utime(live_tmp, (stale, stale))

    def b(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "data"), "w") as fh:
            fh.write("v1")

    assert artifacts.publish(path, "fp", b) is True
    assert not os.path.exists(live_tmp)
    assert artifacts.is_current(path, "fp")


def test_ivf_drift_guard_retrain_recovers_recall(spark, tmp_path):
    """Frozen-centroid drift, tripped and healed: a drifted ingest
    cluster sits on the boundary between two stale centroids, so its
    vectors SPLIT across buckets and nprobe=1 recall collapses; the
    segment-fraction guard trips (1/3 > 0.3), retrains centroids over
    the full set (seeded from the stored ones — the drifted cluster
    migrates into one bucket over the Lloyd steps), folds the
    segments, and recall over the same queries recovers. Compaction
    identity is pinned separately by ann_ivf_compact's shared oracle."""
    import json
    import math
    import os

    from elt_data4transformation_spark.operators import artifacts

    def unit(deg):
        r = math.radians(deg)
        return [round(math.cos(r), 6), round(math.sin(r), 6), 0.0, 0.0]

    # base: two tight clusters at ~0° and ~90°
    a_deg = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 5.0]
    b_deg = [90 - d for d in a_deg]
    # drifted ingest: tight cluster straddling the 45° bucket boundary
    # (uneven spacing so exact-cosine top-3 has no ties)
    c_deg = [43.90, 44.03, 44.20, 44.39, 44.62, 44.91, 45.22, 45.59, 46.00, 46.43]
    base = [(i, unit(d)) for i, d in enumerate(a_deg)] + [
        (100 + i, unit(d)) for i, d in enumerate(b_deg)
    ]
    drifted = [(200 + i, unit(d)) for i, d in enumerate(c_deg)]

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cent = spark.createDataFrame(
        [(0, unit(0.0)), (1, unit(2.0)), (2, unit(88.0))],
        "centroid_id long, cv array<double>",
    )
    cent.write.parquet(f"{idx}/centroids")
    bdf = spark.createDataFrame(base, "vec_id long, v array<double>")
    vectors.assign_nearest(bdf, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index")
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    # frozen-centroid ingest of the drifted batch as a segment
    ddf = spark.createDataFrame(drifted, "vec_id long, v array<double>")
    vectors.assign_nearest(ddf, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index_ingest_a")
    artifacts.update_meta(idx, "t", {"ingests": ["a"]})

    frac = vectors.ivf_segment_fraction(spark, idx)
    assert abs(frac - 1 / 3) < 1e-9

    drift_ids = {vid for vid, _ in drifted}
    # true top-3 neighbors by exact cosine over ALL vectors (numpy):
    # for a drifted query these are always 3 other drifted vectors
    # (mutual cosine >= cos(2.6°), vs <= cos(38°) to any base vector)
    import numpy as np

    all_rows = base + drifted
    ids = np.array([i for i, _ in all_rows])
    mat = np.array([v for _, v in all_rows])
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    truth = {}
    for qi, vid in enumerate(ids):
        if vid not in drift_ids:
            continue
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-sims[qi, i], ids[i]),
        )
        truth[vid] = {ids[i] for i in order[:3]}

    def recall_at_3():
        """nprobe=1 recall for the drifted queries: fraction of each
        query's TRUE top-3 that its own bucket contains."""
        rows = vectors.read_ivf_index(spark, idx).collect()
        bucket_of = {r["vec_id"]: r["centroid_id"] for r in rows}
        hits = total = 0
        for vid, top3 in truth.items():
            for n in top3:
                hits += bucket_of[n] == bucket_of[vid]
                total += 1
        return hits / total

    before = recall_at_3()
    assert before <= 0.9, f"drift fixture did not split buckets ({before})"

    assert vectors.ivf_drift_guard(spark, idx, max_segment_fraction=0.3)
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == []
    assert not any(d.startswith("index_ingest_") for d in os.listdir(idx))
    after = recall_at_3()
    assert after >= 0.95, f"retrain did not recover recall ({after})"
    # below-threshold fraction leaves the index untouched
    assert vectors.ivf_drift_guard(spark, idx, max_segment_fraction=0.3) is False


def test_delete_from_ivf_index_lifecycle(spark, tmp_path):
    """Tombstone DELETE lifecycle for the stored IVF index, mirror of
    the dedup family's: (1) index a base vector set and merge a
    frozen-centroid ingest segment — the nearest neighbor of a query
    can come from either; (2) tombstone one base vector and the
    ingested vector — neither can surface from a probe (the anti-join
    covers every segment) while untouched vectors still rank, and no
    data segment was rewritten; an ORPHAN tombstone not listed in the
    meta is ignored; (3) compaction applies the tombstones physically
    — probe-identical, deletes list cleared, tombstone and ingest
    dirs gone, the index physically shrunk."""
    import json
    import math
    import os

    from elt_data4transformation_spark.operators import artifacts

    def unit(deg):
        r = math.radians(deg)
        return [round(math.cos(r), 6), round(math.sin(r), 6), 0.0, 0.0]

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cent = spark.createDataFrame(
        [(0, unit(0.0)), (1, unit(90.0))],
        "centroid_id long, cv array<double>",
    )
    cent.write.parquet(f"{idx}/centroids")
    # base: cluster A (1..4 at 0..3 deg), cluster B (101..104 near 90)
    base = [(i, unit(i - 1.0)) for i in range(1, 5)] + [
        (100 + i, unit(90.0 - (i - 1.0))) for i in range(1, 5)
    ]
    bdf = spark.createDataFrame(base, "vec_id long, v array<double>")
    vectors.assign_nearest(bdf, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index")
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)
    # frozen-centroid ingest: vec 200 at 0.5 deg — closest to query 1
    ddf = spark.createDataFrame(
        [(200, unit(0.5))], "vec_id long, v array<double>"
    )
    vectors.assign_nearest(ddf, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index_ingest_a")
    artifacts.update_meta(idx, "t", {"ingests": ["a"]})

    def best(qid):
        """Nearest in-bucket neighbor of ``qid``, honoring tombstones
        — the same anti-join-then-rank shape _probe_ivf_index runs."""
        frame = vectors.read_ivf_index(spark, idx)
        dels = vectors.read_ivf_tombstones(spark, idx)
        if dels is not None:
            frame = frame.join(
                F.broadcast(dels.select("vec_id")), "vec_id", "left_anti"
            )
        q = frame.filter(F.col("vec_id") == qid).select(
            F.col("v").alias("qv"), F.col("centroid_id").alias("qc")
        )
        top = (
            frame.join(
                F.broadcast(q),
                (F.col("centroid_id") == F.col("qc"))
                & (F.col("vec_id") != qid),
            )
            .select(
                "vec_id",
                F.round(vectors.cosine_col("qv", "v"), 6).alias("cos"),
            )
            .orderBy(F.desc("cos"), "vec_id")
            .limit(1)
            .collect()
        )
        return top[0]["vec_id"]

    assert best(1) == 200  # the ingested vector is the closest

    # takedown: vec 2 (base segment) and vec 200 (ingest segment)
    vectors.delete_from_ivf_index(
        spark, idx, spark.createDataFrame([(2,), (200,)], "vec_id long"),
        tag="d",
    )
    artifacts.update_meta(idx, "t", {"ingests": ["a"], "deletes": ["d"]})
    assert best(1) == 3, "tombstoned vectors still surface from probes"

    # an orphan tombstone (crashed delete, not in meta) must be ignored
    vectors.delete_from_ivf_index(
        spark, idx, spark.createDataFrame([(3,)], "vec_id long"),
        tag="crashed",
    )
    assert best(1) == 3

    # compaction applies the listed tombstones physically
    assert vectors.compact_ivf_index(spark, idx) is True
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == [] and meta["deletes"] == []
    assert not any(
        d.startswith(("deletes_", "index_ingest_"))
        for d in os.listdir(idx)
    )
    assert best(1) == 3
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{idx}/index").collect()
    }
    assert 2 not in left and 200 not in left, (
        f"compaction did not reclaim deleted vectors: {sorted(left)}"
    )


def test_audio_neardup_detects_all_requantized_twins(spark):
    """audio_neardup's detection guarantee: every re-quantized twin
    (one amplitude bit dropped — a lossy re-encode) lands within the
    Hamming threshold of its source and is reported; no non-twin pair
    slips under the threshold on this fixture."""
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.semistructured import (
        _AFP_HAM,
        _AFP_TWIN_OFF,
    )
    from tests.conftest import SF_SMALL

    import pandas as pd

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    twins = sorted(
        int(d) for d in docs["doc_id"] if d % 90 == 0
    )
    assert len(twins) >= 5  # real positive set at the fixture SF

    rows = REGISTRY["audio_neardup"].fn(spark, SF_SMALL).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    want = {(d, d + _AFP_TWIN_OFF) for d in twins}
    assert got == want, (
        f"missed={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    assert all(0 <= r["hamming"] <= _AFP_HAM for r in rows)


def test_audio_fingerprint_quarantines_corrupt_payload(spark):
    """decode_wav_fingerprint degrades corrupt / non-WAV payloads to
    NULL band keys instead of failing the batch."""
    from elt_data4transformation_spark.operators import multimodal

    good = multimodal.encode_wav_payloads(
        spark.createDataFrame([(7,)], "doc_id long")
    )
    bad = spark.createDataFrame(
        [
            (100, bytearray(b"not a wav"), ("audio/wav", 9)),
            (101, bytearray(b"RIFFjunk"), ("image/png", 8)),
        ],
        "doc_id long, payload binary, "
        "meta struct<mime: string, n_bytes: bigint>",
    )
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_wav_fingerprint(
            good.unionByName(bad)
        ).collect()
    }
    assert all(out[7][f"k{b}"] is not None for b in range(4))
    for bad_id in (100, 101):
        assert all(out[bad_id][f"k{b}"] is None for b in range(4))


def test_sigstore_rows_equal_fresh_computation(spark):
    """The signature store (plans/dedup._sigstore) must hold EXACTLY
    the rows a fresh shingle+minhash pass computes — signatures are
    pure per-row functions of (text, params), so read-instead-of-
    recompute can never change a probe's result."""
    from elt_data4transformation_spark.functions import textfns as T
    from elt_data4transformation_spark.plans.dedup import (
        N_BANDS,
        N_MINHASH,
        SHINGLE,
        _sigstore,
    )
    from tests.conftest import SF_SMALL

    store = _sigstore(spark, SF_SMALL)
    stored_b = {
        (r["doc_id"], r["band_idx"], r["band_key"])
        for r in spark.read.parquet(f"{store}/bands").collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sh = docs.select(
        "doc_id", T.char_shingles_col(SHINGLE).alias("_sh")
    )
    sig = dedup_ops.minhash_signature(
        sh, "doc_id", "_sh", N_MINHASH, N_BANDS
    )
    # the store packs band keys to LONG at publication — mirror it
    fresh_b = {
        (r["doc_id"], r["band_idx"], r["band_key"])
        for r in dedup_ops.pack_band_keys(
            dedup_ops.band_table(sig, "doc_id", N_BANDS)
        ).collect()
    }
    assert stored_b == fresh_b
    # shingle sets AND their packed hashes match (spot-check a handful)
    stored_rows = (
        spark.read.parquet(f"{store}/shingles")
        .filter(F.col("doc_id") < 20)
        .collect()
    )
    stored_sh = {r["doc_id"]: sorted(r["shingles"]) for r in stored_rows}
    stored_h = {r["doc_id"]: sorted(r["sh_hash"]) for r in stored_rows}
    fresh_rows = (
        sh.filter(F.col("doc_id") < 20)
        .withColumn("_h", F.transform("_sh", lambda s: F.xxhash64(s)))
        .collect()
    )
    fresh_sh = {r["doc_id"]: sorted(r["_sh"]) for r in fresh_rows}
    fresh_h = {r["doc_id"]: sorted(r["_h"]) for r in fresh_rows}
    assert stored_sh == fresh_sh
    assert stored_h == fresh_h


def test_video_neardup_detects_all_reencoded_twins(spark):
    """video_neardup's detection guarantee: every re-encoded twin
    (per-frame brightness shift — the lossy re-encode analog) lands
    within the Hamming threshold of its source and is reported; the
    temporal majority vote absorbs per-frame near-tie flips."""
    import pandas as pd

    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.semistructured import (
        _VID_HAM,
        _VID_TWIN_OFF,
    )
    from tests.conftest import SF_SMALL

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    twins = sorted(int(d) for d in docs["doc_id"] if d % 110 == 0)
    assert len(twins) >= 4  # real positive set at the fixture SF

    rows = REGISTRY["video_neardup"].fn(spark, SF_SMALL).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    want = {(d, d + _VID_TWIN_OFF) for d in twins}
    missed = want - got
    assert not missed, f"missed twin pairs: {sorted(missed)[:5]}"
    assert all(0 <= r["hamming"] <= _VID_HAM for r in rows)


def test_video_dhash_quarantines_corrupt_container(spark):
    """decode_video_dhash degrades corrupt containers (bad mime,
    truncated header, truncated frame body) to NULL band keys."""
    from elt_data4transformation_spark.operators import multimodal

    good = multimodal.encode_video_payloads(
        spark.createDataFrame([(7,)], "doc_id long")
    )
    # a truncated copy of a real container: cut mid-frame
    sample = bytes(good.collect()[0]["payload"])
    bad = spark.createDataFrame(
        [
            (100, bytearray(b"\x00\x00"), ("video/png-seq", 2)),
            (101, bytearray(sample[: len(sample) // 2]),
             ("video/png-seq", len(sample) // 2)),
            (102, bytearray(sample), ("image/png", len(sample))),
        ],
        "doc_id long, payload binary, "
        "meta struct<mime: string, n_bytes: bigint>",
    )
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_video_dhash(
            good.unionByName(bad)
        ).collect()
    }
    assert all(out[7][f"k{b}"] is not None for b in range(4))
    for bad_id in (100, 101, 102):
        assert all(out[bad_id][f"k{b}"] is None for b in range(4))


def test_stream_ivf_ingest_merges_and_sequences(spark):
    """The streaming vector-ingest loop: batch 1 must be able to match
    batch 0's vectors (proving the segment MERGE is visible to later
    probes), every probe match must share the probe vector's frozen-
    centroid bucket, and results are deterministic even though the
    fixture writes the later batch's file first (sequencer path)."""
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["stream_ivf_ingest"].fn(spark, SF_SMALL).collect()
    assert rows, "empty probe log"
    # ordering contract
    ids = [r["vec_id"] for r in rows]
    assert ids == sorted(ids)
    # tags match the fixture's id scheme
    assert all(r["vec_id"] % 5 == r["batch_tag"] for r in rows)
    # the merge is real: some tag-1 probes match tag-0 vectors
    cross = [
        r for r in rows
        if r["batch_tag"] == 1 and r["matched_vec_id"] % 5 == 0
    ]
    assert cross, "no tag1->tag0 matches: merged segment invisible"
    # determinism across invocations (second run re-streams, re-probes)
    again = REGISTRY["stream_ivf_ingest"].fn(spark, SF_SMALL).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_stream_index_probe_equals_ingest_loop_rows(spark):
    """The probe-only twin (round 10) must return EXACTLY the rows the
    full streaming ingest loop logs — same probes, same sequencing
    semantics (batch 1 sees batch 0's signatures), minus the stream
    lifecycle and segment durability the like-for-like bench number
    deliberately excludes. Column k aside, any divergence means the
    twin is measuring a different computation than the loop."""
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    probe = REGISTRY["stream_index_probe"].fn(spark, SF_SMALL).collect()
    loop = REGISTRY["stream_index_ingest"].fn(spark, SF_SMALL).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in loop]


def test_srp_band_store_rows_equal_fresh_computation(spark):
    """The SRP band store (plans/dedup._srp_band_store) must hold
    EXACTLY the band keys a fresh 24-plane projection computes —
    deterministic md5-Rademacher planes make read-instead-of-project
    value-neutral."""
    from pyspark.sql import functions as F

    from elt_data4transformation_spark.plans.dedup import (
        _srp_band_store,
        _srp_bands_of,
        _srp_twins_of,
    )
    from tests.conftest import SF_SMALL

    stored = {
        (r["vec_id"], r["band_idx"], r["band_key"])
        for r in _srp_band_store(spark, SF_SMALL).collect()
    }
    e0 = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fresh = {
        (r["vec_id"], r["band_idx"], r["band_key"])
        for r in _srp_bands_of(
            e0.unionByName(_srp_twins_of(e0))
        ).collect()
    }
    assert stored == fresh


def test_retrain_ivf_index_drops_tombstoned_vectors(spark, tmp_path):
    """Delete-then-drift-guard lifecycle: retrain_ivf_index must
    anti-join tombstones out BEFORE re-training (like
    compact_ivf_index does) and swap with cleared ``deletes`` — the
    swap replaces the whole artifact dir, so a forwarded deletes list
    would point at destroyed ``deletes_*`` paths and the erased
    vectors would otherwise be re-indexed from the folded base
    (GDPR-deleted rows resurfacing)."""
    import json
    import math
    import os

    from elt_data4transformation_spark.operators import artifacts

    def unit(deg):
        r = math.radians(deg)
        return [round(math.cos(r), 6), round(math.sin(r), 6), 0.0, 0.0]

    base = [(i, unit(3.0 * i)) for i in range(12)]
    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cent = spark.createDataFrame(
        [(0, unit(2.0)), (1, unit(30.0))],
        "centroid_id long, cv array<double>",
    )
    cent.write.parquet(f"{idx}/centroids")
    bdf = spark.createDataFrame(base, "vec_id long, v array<double>")
    vectors.assign_nearest(bdf, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index")
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": [], "deletes": []}, fh)

    # tombstone two vectors, stamp the meta (delete-then-crash safety
    # is covered elsewhere; here the delete is fully committed)
    dels = spark.createDataFrame([(3,), (7,)], "vec_id long")
    vectors.delete_from_ivf_index(spark, idx, dels, tag="d0")
    artifacts.update_meta(idx, "t", {"deletes": ["d0"]})

    vectors.retrain_ivf_index(spark, idx, iters=1)

    live = {r["vec_id"] for r in vectors.read_ivf_index(spark, idx).collect()}
    assert live == {i for i, _ in base} - {3, 7}, "tombstoned ids resurfaced"
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == [] and meta["deletes"] == []
    # post-retrain readers must not chase destroyed deletes_* paths
    assert vectors.read_ivf_tombstones(spark, idx) is None
    assert vectors.compact_ivf_index(spark, idx) is False  # nothing left


def test_checked_thread_reraises_at_join():
    """A failed background segment write must surface at join() —
    BEFORE the meta stamp — or a partial segment gets listed,
    breaking the 'crashed merge = unlisted orphan' invariant."""
    from elt_data4transformation_spark.operators import artifacts

    def boom():
        raise RuntimeError("segment write failed")

    th = artifacts.CheckedThread(target=boom)
    th.start()
    with pytest.raises(RuntimeError, match="segment write failed"):
        th.join()

    ok = artifacts.CheckedThread(target=lambda: None)
    ok.start()
    ok.join()  # clean path: no exception


def test_install_restores_previous_artifact_on_rename_failure(
    tmp_path, monkeypatch
):
    """_install's failure path must RESTORE the renamed-aside previous
    artifact when the tmp->path rename fails for a non-race OSError:
    blindly rmtree-ing `old` would destroy the only good artifact and
    leave `path` absent."""
    import os

    from elt_data4transformation_spark.operators import artifacts

    path = str(tmp_path / "art")
    os.makedirs(path)
    with open(os.path.join(path, "data"), "w") as fh:
        fh.write("good")
    tmp = str(tmp_path / "art.tmp.x")
    os.makedirs(tmp)

    real_rename = os.rename

    def failing_rename(src, dst):
        if src == tmp:
            raise OSError("transient EACCES")  # the second rename fails
        return real_rename(src, dst)

    monkeypatch.setattr(artifacts.os, "rename", failing_rename)
    assert artifacts._install(tmp, path) is False
    monkeypatch.undo()

    # previous artifact restored, byte-for-byte; no .old debris left
    with open(os.path.join(path, "data")) as fh:
        assert fh.read() == "good"
    debris = [e for e in os.listdir(tmp_path) if ".old." in e]
    assert debris == []


def test_fuzzy_decontamination_catches_paraphrase_exact_misses(
    spark, tmp_path
):
    """The reason decontamination_fuzzy exists: a paraphrased eval doc
    (word swaps sprinkled through the text) shares ZERO exact word
    8-grams with its train source — the exact gate passes it — but its
    char-5-shingle Jaccard stays high, so the MinHash/LSH probe flags
    it. Verified on a crafted pair through the same operator path the
    registered query uses (write_band_index train side, probe test
    side)."""
    train = (
        "the quick brown fox jumps over the lazy dog while the spark "
        "engine shuffles partitions across the cluster and the driver "
        "collects nothing because the plan stays fully distributed "
        "throughout every stage of the long running job "
        "meanwhile the scheduler assigns tasks to executors and "
        "the shuffle service streams blocks between nodes while the "
        "catalyst optimizer rewrites the logical plan into a physical "
        "one with whole stage code generation enabled for every operator"
    )
    # paraphrase: mutate one word in every 7-word window -> no exact
    # 8-gram survives; char-5-shingle Jaccard stays ~0.86 and both LSH
    # bands still collide (fixture pinned against the production
    # 8-minhash/2-band config — deterministic md5 hash family)
    words = train.split()
    para = list(words)
    for i in range(4, len(para), 7):
        para[i] = para[i] + "x"
    test_doc = " ".join(para)

    # exact 8-gram overlap is ZERO (what decontamination_check tests)
    g = lambda ws: {  # noqa: E731
        tuple(ws[i : i + 8]) for i in range(len(ws) - 7)
    }
    assert not (g(words) & g(test_doc.split())), (
        "fixture broken: paraphrase still shares an exact 8-gram"
    )

    idx = str(tmp_path / "train_idx")
    dedup_ops.write_band_index(
        spark.createDataFrame([(1, train)], "doc_id long, text string"),
        idx,
    )
    hits = dedup_ops.probe_band_index(
        spark,
        idx,
        spark.createDataFrame(
            [(100, test_doc)], "doc_id long, text string"
        ),
        threshold=0.5,
    ).collect()
    assert [(r["new_doc_id"], r["matched_doc_id"]) for r in hits] == [
        (100, 1)
    ], "fuzzy probe missed the paraphrased leak"
    assert hits[0]["jaccard_raw"] >= 0.5


def test_sigstore_delta_probe_prunes_id_class_partitions(spark):
    """The 100 TB pruning claim, executed: the signature store is
    directory-partitioned by doc_mod (the ingest id class), and a
    delta probe's store scan carries the class in PartitionFilters —
    every other class's directories are never read (bucket-by-doc-id,
    single-node form)."""
    import re

    from elt_data4transformation_spark.plans.dedup import (
        DELTA_MOD,
        _stored_delta_sig,
    )
    from tests.conftest import SF_SMALL

    sh, bands = _stored_delta_sig(spark, SF_SMALL, None, mod_class=0)
    for name, df in (("shingles", sh), ("bands", bands)):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = re.search(r"PartitionFilters: \[(.*?)\]", plan)
        assert pf and "doc_mod" in pf.group(1), f"{name}: {plan}"
        assert re.search(r"doc_mod#?\d*\s*=\s*0", pf.group(1)), pf.group(1)
    # the pruned slice is exactly the id class
    ids = {r["doc_id"] for r in sh.select("doc_id").collect()}
    assert ids and all(i % DELTA_MOD == 0 for i in ids)


def test_stream_ingest_restart_recovers_exactly_once(spark, tmp_path):
    """The ingest loop's crash protocol, executed end-to-end: the sink
    CRASHES between a segment write and its meta stamp (the exact
    window the protocol is designed for), the stream restarts from the
    SAME checkpoint, and Structured Streaming redelivers only the
    uncommitted batch — whose idempotent re-ingest (per-tag overwrite,
    meta stamped last) leaves the index with no duplicate and no lost
    row: the final state is bit-identical to a never-crashed run."""
    import json
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from elt_data4transformation_spark.operators import artifacts

    base_rows = [
        (i, f"base document number {i} with some shared filler text "
            f"about spark executors and shuffle partitions item {i}")
        for i in range(5)
    ]
    batches = {
        0: [(10 + i, base_rows[i][1] + " ingested copy") for i in range(3)],
        1: [(20 + i, base_rows[i][1] + " second wave copy") for i in range(3)],
    }

    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(
        spark.createDataFrame(base_rows, "doc_id long, text string"), idx
    )
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    import pandas as pd

    for t, rows in batches.items():
        # flat files: FileStreamSource does not recurse into the
        # directory layout spark-writes produce
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(src, f"b{t}.parquet"), index=False
        )
    ckpt = str(tmp_path / "ckpt")

    def run(fail_on_tag):
        def sink(batch_df, _bid):
            tag = batch_df.agg(
                F.min((F.col("doc_id") / 10).cast("int"))
            ).collect()[0][0] - 1
            _, merge, _, _, release = dedup_ops.ingest_band_index(
                spark, idx, batch_df, tag=str(tag),
                idx_bands=spark.read.parquet(f"{idx}/bands"),
                idx_sh=spark.read.parquet(f"{idx}/shingles"),
            )
            merge()  # segment durable...
            release()
            if tag == fail_on_tag:
                raise RuntimeError("crash between write and stamp")
            meta = artifacts.load_meta(idx)  # ...stamp LAST
            artifacts.update_meta(
                idx, "t", {"ingests": meta["ingests"] + [str(tag)]}
            )

        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        run(fail_on_tag=1)

    # crashed state: tag 0 committed; tag 1's segment is a durable but
    # UNLISTED orphan — readers must ignore it
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == ["0"]
    assert os.path.exists(f"{idx}/bands_ingest_1")
    visible = {
        r["doc_id"]
        for d in dedup_ops._index_segments(idx)[0]
        for r in spark.read.parquet(d).select("doc_id").collect()
    }
    assert visible == {0, 1, 2, 3, 4, 10, 11, 12}, visible

    # restart from the SAME checkpoint: batch 0 is committed and NOT
    # redelivered; batch 1 redelivers, overwrites its orphan, stamps
    run(fail_on_tag=None)
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == ["0", "1"]
    all_rows = [
        r["doc_id"]
        for d in dedup_ops._index_segments(idx)[1]
        for r in spark.read.parquet(d).select("doc_id").collect()
    ]
    assert sorted(all_rows) == sorted(set(all_rows)), "duplicate ingest"
    assert set(all_rows) == {0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22}


def test_probe_candidate_cap_bounds_adversarial_fanout(spark, tmp_path):
    """The per-probe-doc candidate cap (PROBE_MAX_CANDIDATES): a
    boilerplate flood — one probe doc near-identical to 100 corpus
    docs — must rescore at most B candidates (bounded work even when
    the corpus side is pathologically duplicated) while still
    returning a correct >=0.5 best match for the probe doc."""
    import json
    import os

    from elt_data4transformation_spark.operators import artifacts

    boiler = (
        "accept our cookies to continue reading this article about "
        "the terms of service and the privacy policy of this website "
        "which collects usage analytics for advertising purposes"
    )
    # 100 corpus docs: the same boilerplate with a tiny unique suffix
    corpus = [(i, f"{boiler} variant {i}") for i in range(100)]
    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(
        spark.createDataFrame(corpus, "doc_id long, text string"), idx
    )
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    probe = spark.createDataFrame(
        [(1000, boiler + " fresh arrival")], "doc_id long, text string"
    )
    scored = dedup_ops.probe_band_index(spark, idx, probe).collect()
    assert 0 < len(scored) <= dedup_ops.PROBE_MAX_CANDIDATES, len(scored)
    assert all(r["jaccard_raw"] >= 0.5 for r in scored)
    # deterministic: the same capped set on a second run
    again = dedup_ops.probe_band_index(spark, idx, probe).collect()
    assert sorted(map(tuple, scored)) == sorted(map(tuple, again))


def test_ingest_band_index_fused_equals_sequential_per_tag(spark, tmp_path):
    """The fused multi-tag probe (round 11): one source-gated pass
    must return EXACTLY the union of the sequential per-tag probes —
    tag 0 sees only the base (never its own or tag 1's segment),
    tag 1 sees base + tag 0's segment. The fixture plants a cross-tag
    near-dup pair so a visibility-gate failure would change rows in
    both directions (a leak adds tag0->tag1 matches; an over-filter
    drops the tag1->tag0 match)."""
    import json
    import os

    from elt_data4transformation_spark.operators import artifacts

    filler = (
        "spark executors exchange shuffle blocks across the cluster "
        "network while the scheduler assigns tasks to idle cores"
    )
    base = [(i, f"{filler} base doc number {i}") for i in range(2, 7)]
    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(
        spark.createDataFrame(base, "doc_id long, text string"), idx
    )
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    # tag = doc_id % 5: 10/15 -> tag 0, 11/16 -> tag 1; 11 is a
    # near-dup of 10 (cross-tag pair), 16 of base doc 2
    batch = [
        (10, f"{filler} arriving first wave payload"),
        (15, f"{filler} unrelated first wave item"),
        (11, f"{filler} arriving first wave payload indeed"),
        (16, f"{filler} base doc number 2"),
    ]
    # presign like _ensure_stream_src: shingles + packed hashes +
    # band keys in band order
    raw = spark.createDataFrame(
        batch, "doc_id long, text string"
    ).select("doc_id", "text", T.char_shingles_col(5).alias("shingles"))
    keys = dedup_ops.minhash_signature(
        raw.select("doc_id", "shingles"), "doc_id", "shingles", 8, 2
    ).select(
        "doc_id",
        F.array(
            *[F.xxhash64(F.col(f"band{b}")) for b in range(2)]
        ).alias("bkeys"),
    )
    sig = raw.join(keys, "doc_id").select(
        "doc_id",
        "text",
        "shingles",
        F.size("shingles").cast("long").alias("n_sh"),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("sh_hash"),
        "bkeys",
    )
    d0 = sig.filter(F.col("doc_id") % 5 == 0)
    d1 = sig.filter(F.col("doc_id") % 5 == 1)
    base_bands = spark.read.parquet(f"{idx}/bands")
    base_sh = spark.read.parquet(f"{idx}/shingles")

    # sequential per-tag reference (the pre-fuse drain shape)
    bands_view, sh_view, seq = base_bands, base_sh, []
    for tag, delta in ((0, d0), (1, d1)):
        probed, _m, seg_bands, seg_sh, release = (
            dedup_ops.ingest_band_index(
                spark, idx, None, tag=str(tag), threshold=0.5,
                idx_bands=bands_view, idx_sh=sh_view, delta_sig=delta,
                id_col="doc_id",
            )
        )
        seq += [(tag, *r) for r in probed.collect()]
        bands_view = bands_view.unionByName(
            seg_bands.select("doc_id", "band_idx", "band_key")
        )
        sh_view = sh_view.unionByName(seg_sh)
        release()

    scored, per_tag = dedup_ops.ingest_band_index_fused(
        spark, idx, [(0, d0), (1, d1)],
        idx_bands_src=[(-1, base_bands)], idx_sh=base_sh,
        threshold=0.5, id_col="doc_id",
    )
    fused = [
        (r["new_doc_id"] % 5, r["new_doc_id"], r["matched_doc_id"],
         r["jaccard_raw"])
        for r in scored.collect()
    ]
    for _t, _m, _sb, _ss, release in per_tag:
        release()
    assert sorted(fused) == sorted(seq)
    # the planted pair proves the gate is neither leaky nor over-tight
    pairs = {(t, m) for t, _n, m, _j in fused}
    assert (1, 10) in pairs, "tag1 cannot see tag0's segment"
    assert not any(t == 0 and m >= 10 for t, m in pairs), (
        "tag0 leaked a same-batch candidate"
    )


def test_cubefile_roundtrip_and_quarantine(spark):
    """GENESIS cubefile decode: parse(encode(x)) recovers every fact
    group exactly (axes in axis order, per-measure value/quality/
    locked, German decimals, documented missing codes -> NULL), and a
    truncated fact line is quarantined (dropped), never a crash."""
    from elt_data4transformation_spark.operators import cubefile

    payload = cubefile.encode_cubefile(
        "99999TEST",
        axes=["A1", "A2"],
        time_var="JAHR",
        measures=[("M1", "EUR"), ("M2", "Anzahl")],
        facts=[
            ("x1", "y1", "2021", ("10,25", "e", "0"), ("3", "", "1")),
            ("x2", "y2", "2022", ("...", "", "0"), ("0,5", "p", "0")),
        ],
    )
    # adversarial: a fact line with too few tokens (truncated upload)
    payload += "\nD;x3;y3;2023;1,0"
    df = spark.createDataFrame([("c", payload)], ["cube_id", "payload"])
    rows = {
        (r["dims"], r["time_code"], r["measure"]): (
            r["value"],
            r["quality"],
            r["locked"],
        )
        for r in cubefile.parse_cubefile(df).collect()
    }
    assert rows == {
        ("A1=x1|A2=y1", "2021", "M1"): (10.25, "e", False),
        ("A1=x1|A2=y1", "2021", "M2"): (3.0, None, True),
        ("A1=x2|A2=y2", "2022", "M1"): (None, None, False),
        ("A1=x2|A2=y2", "2022", "M2"): (0.5, "p", False),
    }, rows  # the truncated x3 line must not appear


def test_cubefile_headers_and_missing_codes(spark):
    """Header extraction (axis/measure order, time var, QEI position)
    and every documented GENESIS missing-value code -> NULL value."""
    from elt_data4transformation_spark.operators import cubefile

    codes = ["...", ".", "-", "/", "x"]
    payload = cubefile.encode_cubefile(
        "11111TEST",
        axes=["REG"],
        time_var="STAG",
        measures=[("B1", "Anzahl")],
        facts=[(f"r{i}", "2020", (c, "q", "0")) for i, c in enumerate(codes)],
    )
    df = spark.createDataFrame([("c", payload)], ["cube_id", "payload"])
    hdr = cubefile.cube_headers(df).collect()[0]
    assert hdr["axes"] == ["REG"]
    assert hdr["measures"] == ["B1"]
    assert hdr["time_var"] == "STAG"
    out = cubefile.parse_cubefile(df).collect()
    assert len(out) == len(codes)
    assert all(r["value"] is None and r["quality"] == "q" for r in out)


def test_cubefile_missing_header_sections_decode_empty(spark):
    """ADVICE round-6 fix: a cubefile MISSING a K;<tag> header must
    decode that section as empty — not mis-attribute earlier D rows
    (array_position returns 0 for absent headers; unguarded, every
    line index passed the range test). A file with no K;QEI yields
    zero fact rows; a file with no K;DQA yields empty axes."""
    from elt_data4transformation_spark.operators import cubefile

    payload = cubefile.encode_cubefile(
        "22222TEST",
        axes=["REG"],
        time_var="STAG",
        measures=[("B1", "Anzahl")],
        facts=[("r1", "2020", ("5", "", "0"))],
    )
    no_qei = "\n".join(
        ln for ln in payload.split("\n") if not ln.startswith("K;QEI")
    )
    no_dqa = "\n".join(
        ln for ln in payload.split("\n") if not ln.startswith("K;DQA")
    )
    df = spark.createDataFrame(
        [("no_qei", no_qei), ("no_dqa", no_dqa)], ["cube_id", "payload"]
    )
    hdrs = {r["cube_id"]: r for r in cubefile.cube_headers(df).collect()}
    # missing K;DQA -> axes empty, NOT the D rows of the K;DQ section
    assert hdrs["no_dqa"]["axes"] == []
    assert hdrs["no_qei"]["axes"] == ["REG"]
    facts = cubefile.parse_cubefile(
        df.filter(F.col("cube_id") == "no_qei")
    ).collect()
    assert facts == []  # no QEI header -> no fact rows, no mis-parse


def test_jpeg_codec_roundtrip_bounds_and_quarantine():
    """The pure-stdlib baseline JPEG codec: encode->decode recovers a
    smooth gradient within tight bounds, a solid color EXACTLY (all-AC
    -zero blocks), grayscale decodes, and every corrupt-input class
    (empty, bad SOI, truncated header, truncated entropy data,
    progressive marker) raises ValueError — the quarantine contract."""
    import numpy as np

    from elt_data4transformation_spark.operators import jpegcodec as J

    w, h = 37, 21  # non-multiple-of-8 exercises edge padding
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (x * 5 % 250, y * 9 % 250, (x + y) * 4 % 250)
    data = J.write_jpeg(w, h, px.tobytes(), quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w2, h2, out = J.read_jpeg(data)
    assert (w2, h2) == (w, h)
    err = np.abs(out.astype(int) - px.astype(int))
    mse = float((err.astype(float) ** 2).mean())
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 35, psnr

    solid = np.full((16, 16, 3), (120, 200, 40), dtype=np.uint8)
    _, _, out2 = J.read_jpeg(J.write_jpeg(16, 16, solid.tobytes(), 95))
    assert int(np.abs(out2.astype(int) - solid.astype(int)).max()) == 0

    for bad in (b"", b"\x00\x01", data[:40], data[: len(data) // 2]):
        with pytest.raises(ValueError):
            J.read_jpeg(bad)
    # progressive SOF2 is out of subset -> quarantined, not misparsed
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        J.read_jpeg(bytes(prog))


def test_jpeg_subsampling_and_restart_markers():
    """Round-7 extension: 4:2:0 / 4:2:2 chroma-subsampled encode and
    decode (2x2-subsampled MCUs) round-trip within PSNR bounds, the
    SOF sampling bytes are correct, and DRI/RSTn restart intervals
    decode to EXACTLY the same pixels as the unrestarted stream."""
    import numpy as np

    from elt_data4transformation_spark.operators import jpegcodec as J

    w, h = 37, 21  # non-multiple-of-16 exercises MCU edge padding
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (x * 5 % 250, y * 9 % 250, (x + y) * 4 % 250)

    for mode, hv_byte, psnr_floor in (("420", 0x22, 28), ("422", 0x21, 30)):
        data = J.write_jpeg(w, h, px.tobytes(), 95, subsampling=mode)
        sof = data.find(b"\xff\xc0")
        assert data[sof + 11] == hv_byte  # Y component sampling h<<4|v
        w2, h2, out = J.read_jpeg(data)
        assert (w2, h2) == (w, h)
        mse = float(((out.astype(float) - px.astype(float)) ** 2).mean())
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > psnr_floor, (mode, psnr)

    plain = J.write_jpeg(w, h, px.tobytes(), 90, subsampling="420")
    rst = J.write_jpeg(
        w, h, px.tobytes(), 90, subsampling="420", restart_interval=2
    )
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    _, _, out_plain = J.read_jpeg(plain)
    _, _, out_rst = J.read_jpeg(rst)
    # identical coefficients, only the entropy framing differs
    assert np.array_equal(out_plain, out_rst)

    # restart marker out of sequence -> quarantined
    mut = bytearray(rst)
    i = rst.find(b"\xff\xd0", rst.find(b"\xff\xda"))
    assert i > 0
    mut[i + 1] = 0xD5
    with pytest.raises(ValueError):
        J.read_jpeg(bytes(mut))


def test_jpeg_forged_sof_dims_raise_before_allocation():
    """ADVICE round-7 fix: a tiny payload whose SOF claims huge
    dimensions must raise ValueError in the quarantine contract, not
    MemoryError from allocating ~100 GB of decode planes."""
    import struct

    import numpy as np

    from elt_data4transformation_spark.operators import jpegcodec as J

    px = np.zeros((16, 16, 3), dtype=np.uint8)
    data = J.write_jpeg(16, 16, px.tobytes(), 90)
    sof = data.find(b"\xff\xc0")

    forged = bytearray(data)
    forged[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="pixel cap"):
        J.read_jpeg(bytes(forged))

    # dims under the pixel cap but impossible for the entropy bytes
    forged2 = bytearray(data)
    forged2[sof + 5 : sof + 9] = struct.pack(">HH", 4000, 4000)
    with pytest.raises(ValueError, match="entropy data size"):
        J.read_jpeg(bytes(forged2))


def test_jpeg_malformed_inputs_raise_valueerror_only():
    """ADVICE round-6 fix: every malformed-input class that used to
    escape as KeyError/IndexError must surface as ValueError so the
    callers' quarantine handlers catch it — undeclared Huffman/quant
    table ids, scan component ids not in the frame, a file ending in
    a lone 0xFF, and short DQT/DHT segments."""
    import numpy as np

    from elt_data4transformation_spark.operators import jpegcodec as J

    solid = np.full((16, 16, 3), (120, 200, 40), dtype=np.uint8)
    data = J.write_jpeg(16, 16, solid.tobytes(), 90)
    sof = data.find(b"\xff\xc0")
    sos = data.find(b"\xff\xda")
    dqt = data.find(b"\xff\xdb")
    dht = data.find(b"\xff\xc4")

    def mutated(offset: int, value: int) -> bytes:
        mut = bytearray(data)
        mut[offset] = value
        return bytes(mut)

    cases = {
        # SOS tdta of component 1 -> undeclared Huffman table id 3
        "undeclared huffman": mutated(sos + 6, 0x33),
        # SOS component id -> no matching SOF component
        "scan id mismatch": mutated(sos + 5, 9),
        # SOF tq of component 1 -> undeclared quant table id 7
        "undeclared quant": mutated(sof + 12, 7),
        # lone trailing 0xFF where a marker pair is expected
        "lone 0xff": b"\xff\xd8\xff",
        # DQT segment length shorter than one 65-byte table
        "short dqt": data[: dqt + 2] + b"\x00\x05" + data[dqt + 4 :],
        # DHT segment length shorter than the 17-byte header
        "short dht": data[: dht + 2] + b"\x00\x08" + data[dht + 4 :],
    }
    for name, payload in cases.items():
        with pytest.raises(ValueError):
            J.read_jpeg(payload)


def test_avi_foreign_stream_chunks_excluded():
    """ADVICE round-6 fix: movi chunks from streams other than the
    declared video stream (00) — e.g. an audio stream's 01wb/01dc —
    must not interleave into the MJPEG frame list."""
    import numpy as np

    from elt_data4transformation_spark.operators import (
        avicodec as A,
        jpegcodec as J,
    )

    w, h = 16, 12
    frames = [
        J.write_jpeg(
            w,
            h,
            np.full((h, w, 3), 40 * (f + 1), dtype=np.uint8).tobytes(),
            95,
        )
        for f in range(3)
    ]
    avi = A.write_avi_mjpeg(w, h, frames)
    # relabel the SECOND frame chunk as stream 01 (foreign stream)
    first = avi.find(b"00dc")
    second = avi.find(b"00dc", first + 4)
    assert second > 0
    mut = bytearray(avi)
    mut[second : second + 2] = b"01"
    w2, h2, out = A.read_avi_mjpeg(bytes(mut))
    assert (w2, h2) == (w, h)
    assert out == [frames[0], frames[2]]  # foreign chunk excluded


def test_jpeg_decode_real_route_and_null_quarantine(spark):
    """multimodal._decode_real routes image/jpeg through the stdlib
    codec (width/height/channel means), and decode_jpeg_roundtrip
    yields NULL rows for corrupt payloads instead of failing the
    stage."""
    import numpy as np

    from elt_data4transformation_spark.operators import (
        jpegcodec as J,
        multimodal,
    )

    solid = np.full((8, 8, 3), (10, 20, 30), dtype=np.uint8)
    payload = J.write_jpeg(8, 8, solid.tobytes(), 95)
    feats = multimodal._decode_real(payload, "image/jpeg")
    assert (feats["width"], feats["height"]) == (8, 8)
    assert abs(feats["mean_r"] - 10) <= 1 and abs(feats["mean_b"] - 30) <= 1

    good = multimodal.encode_jpeg_payloads(
        spark.createDataFrame([(13,)], "doc_id long"), quality=95
    )
    bad = good.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.expr("substring(payload, 1, 30)").alias("payload"),
        "meta",
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg_roundtrip(
            good.unionByName(bad)
        ).collect()
    }
    assert rows[13]["width"] == 8 + 13 % 8
    assert rows[13]["max_err"] is not None and rows[13]["max_err"] <= 32
    assert rows[14]["width"] is None and rows[14]["max_err"] is None


def test_avi_mjpeg_container_roundtrip_and_quarantine(spark):
    """The RIFF AVI MJPEG codec: container round-trip is byte-exact on
    the frame payloads, dimensions come from the headers, every
    corrupt class (empty, non-AVI, truncated, non-MJPG fourcc) raises
    ValueError, and the Spark round-trip path yields NULL rows for
    corrupt payloads."""
    import numpy as np

    from elt_data4transformation_spark.operators import (
        avicodec as A,
        jpegcodec as J,
        multimodal,
    )

    w, h = 16, 12
    frames = [
        J.write_jpeg(
            w,
            h,
            (
                np.fromfunction(
                    lambda y, x, c: (x * 7 + y * 11 + f * 19 + c * 5) % 256,
                    (h, w, 3),
                )
            ).astype(np.uint8).tobytes(),
            95,
        )
        for f in range(5)
    ]
    avi = A.write_avi_mjpeg(w, h, frames)
    w2, h2, out = A.read_avi_mjpeg(avi)
    assert (w2, h2) == (w, h) and out == frames  # byte-exact framing

    for bad in (b"", b"RIFF\x00\x00\x00\x00XXXX", avi[:40],
                avi[: len(avi) // 2]):
        with pytest.raises(ValueError):
            A.read_avi_mjpeg(bad)
    mut = bytearray(avi)
    i = avi.find(b"MJPG")
    mut[i : i + 4] = b"H264"
    with pytest.raises(ValueError):
        A.read_avi_mjpeg(bytes(mut))

    good = multimodal.encode_avi_payloads(
        spark.createDataFrame([(17,)], "doc_id long"), quality=95
    )
    bad_df = good.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.expr("substring(payload, 1, 64)").alias("payload"),
        "meta",
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.decode_avi_roundtrip(
            good.unionByName(bad_df)
        ).collect()
    }
    ok = rows[17]
    assert ok["width"] == 8 + 17 % 8 and ok["n_frames"] == multimodal.VIDEO_FRAMES
    assert ok["max_err"] is not None and ok["max_err"] <= 36
    assert rows[18]["width"] is None and rows[18]["n_frames"] is None


def test_adpcm_codec_tracking_and_quarantine(spark):
    """The IMA ADPCM codec: a smooth signal round-trips within the
    slope-tracking error bound, the payload is genuinely compressed
    (~4 bits/sample vs 16), the fact chunk trims block padding to the
    exact sample count, every corrupt class raises ValueError, and
    the Spark round-trip path NULL-quarantines corrupt payloads."""
    import numpy as np

    from elt_data4transformation_spark.operators import (
        adpcmcodec as A,
        multimodal,
    )

    t = np.arange(2000)
    sine = (3000 * np.sin(t / 40)).astype(np.int16)
    data = A.write_wav_adpcm(sine)
    rate, out = A.read_wav_adpcm(data)
    assert rate == 8000 and len(out) == len(sine)
    err = np.abs(out.astype(int) - sine.astype(int))
    assert err.max() <= 256 and err.mean() <= 16, (err.max(), err.mean())
    # 4-bit codes + block headers: well under half the PCM bytes
    assert len(data) < len(sine)  # 2000 samples = 4000 PCM bytes

    for bad in (b"", b"RIFF\x00\x00\x00\x00WAVE", data[:30],
                data[: len(data) // 2]):
        with pytest.raises(ValueError):
            A.read_wav_adpcm(bad)

    good = multimodal.encode_adpcm_payloads(
        spark.createDataFrame([(19,)], "doc_id long")
    )
    bad_df = good.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.expr("substring(payload, 1, 20)").alias("payload"),
        "meta",
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.decode_adpcm_roundtrip(
            good.unionByName(bad_df)
        ).collect()
    }
    assert rows[19]["n_samples"] == 400 + (19 % 50) * 8
    assert rows[19]["max_err"] is not None and rows[19]["max_err"] <= 192
    assert rows[20]["n_samples"] is None


def test_canonical_metadata_null_keywords_match_oracle(spark, tmp_path):
    """ADVICE round-7 fix: a doc whose text has fewer tokens than its
    source's keyword shape assumes yields NULL keyword lists; Spark
    must COALESCE them to '' (as the oracle does) so metadata_hash
    stays a real hash instead of null-propagating through the concat."""
    import duckdb

    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import assert_frames_match

    # doc_id 14 -> soep shape (needs w[1..4]); 21 -> destatis (w[1..3]);
    # 35 -> eurostat (w[1]); all % 7 == 0. One-token text starves every
    # shape; a NULL-text row exercises the split(NULL) path too.
    docs = spark.createDataFrame(
        [(14, "solo"), (21, "einzel"), (35, "single"), (70, None)],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    spec = REGISTRY["canonical_metadata"]
    got = spec.fn(spark, str(tmp_path)).toPandas()
    assert got["metadata_hash"].notna().all(), got
    assert (got["keywords"] == "").all()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = con.execute(spec.oracle).df()
    con.close()
    assert_frames_match(got, oracle, "canonical_metadata_null_keywords")


def test_html_extract_text_decomposes_invisible_elements(spark):
    """Round-7 VERDICT fidelity fix: HTML extraction must mirror
    reference extract_text_from_html (study_scraper/fulltext.py:
    98-111) — script/style/noscript CONTENT dropped (decompose, not
    tag-strip), tags become separators, whitespace collapsed."""
    from elt_data4transformation_spark.plans.fulltext import (
        html_extract_text,
    )

    html = (
        "<!DOCTYPE html><html><head>"
        "<style type='text/css'>body { color: red }</style>"
        "<SCRIPT src='x.js'>var x = 1;</SCRIPT>"
        "</head><body><h1>Umfrage</h1>\n\n  <p>SPD   25 %</p>"
        "<noscript>enable js</noscript>"
        "<table><tr><td>CDU</td><td>30 %</td></tr></table>"
        "</body></html>"
    )
    df = spark.createDataFrame([(html,)], "raw string")
    out = df.select(html_extract_text(F.col("raw")).alias("t")).head()["t"]
    assert out == "Umfrage SPD 25 % CDU 30 %"
    for leaked in ("var x", "color: red", "enable js", "<"):
        assert leaked not in out


def test_probe_plan_is_fused_single_pass(spark, tmp_path):
    """Round-8 fusion pin: _probe_with_signatures must run as ONE
    action — no persisted candidate intermediate (InMemoryTableScan)
    and both probe-side joins broadcast (the capped candidate pairs
    and the delta arrays each broadcast SEPARATELY into the stored-
    shingle scan; joining them before the broadcast replicates wide
    arrays per pair and measured a 2x regression)."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    corpus = spark.createDataFrame(
        [(i, base + f"tail {i}") for i in range(4)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    dedup_ops.write_band_index(corpus, idx, id_col="doc_id",
                               text_col="text")
    delta = spark.createDataFrame(
        [(100, base.replace("lazy", "sleepy"))],
        "doc_id long, text string",
    )
    # stored-segment delta shape (the plans' path): signatures arrive
    # precomputed, so NOTHING in the probe plan may persist — the
    # raw-text path legitimately caches the delta's shingle pass, which
    # is why that path is not the one pinned here
    dsh = delta.select(
        "doc_id",
        T.char_shingles_col(5).alias("shingles"),
    ).select(
        "doc_id",
        "shingles",
        F.size("shingles").cast("long").alias("n_sh"),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("sh_hash"),
    )
    dsig = dedup_ops.minhash_signature(
        delta.select(
            F.col("doc_id"), T.char_shingles_col(5).alias("_sh")
        ),
        "doc_id",
        "_sh",
        8,
        2,
    )
    dbands = dedup_ops.pack_band_keys(
        dedup_ops.band_table(dsig, "doc_id", 2)
    )
    scored = dedup_ops.probe_band_index(
        spark, idx, delta_sh=dsh, delta_bands=dbands, threshold=0.5
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan, (
        "probe re-grew a persisted intermediate — the fused "
        "single-action shape regressed to the persist+count form"
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # and the probe still finds the near-dups (full value correctness
    # is the oracle suite's job; this test pins the plan shape)
    rows = {(r["new_doc_id"], r["matched_doc_id"]) for r in scored.collect()}
    assert rows and all(n == 100 and m in range(4) for n, m in rows)


def test_pair_min_ignores_failure_sentinel(tmp_path):
    """scripts/pair_min.py: a -1.0 failure sentinel in one run must
    not win the per-query min (a failed run is a missing measurement);
    only an all-runs failure keeps the sentinel, and the recomputed
    total never sums negatives."""
    import json
    import subprocess
    import sys as _sys

    runs = []
    for i, q in enumerate(
        [
            {"a": 2.0, "b": -1.0, "c": -1.0},
            {"a": 3.0, "b": 1.5, "c": -1.0},
        ]
    ):
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps(
            {"metric": "m", "value": sum(v for v in q.values() if v >= 0),
             "unit": "sec", "queries": q, "sf": 0.1}
        ))
        runs.append(str(p))
    out = tmp_path / "min.json"
    subprocess.run(
        [_sys.executable, "scripts/pair_min.py", str(out), *runs],
        check=True, capture_output=True, cwd="/root/repo",
    )
    got = json.loads(out.read_text())
    assert got["queries"] == {"a": 2.0, "b": 1.5, "c": -1.0}
    assert got["value"] == 3.5


def test_pair_min_side_dicts_and_registry_guard(tmp_path):
    """scripts/pair_min.py: (a) side-specific per-query dicts (e.g.
    bench_duckdb's full_queries) get the SAME -1.0 failure-sentinel
    rule as the primary queries dict; (b) the registry-coverage check
    survives ``python -O`` (it must not be a bare assert)."""
    import json
    import subprocess
    import sys as _sys

    runs = []
    for i, (q, fq) in enumerate(
        [
            ({"a": 2.0, "b": 4.0}, {"a": 2.0, "b": -1.0}),
            ({"a": 3.0, "b": 1.5}, {"a": -1.0, "b": 1.5}),
        ]
    ):
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps(
            {"metric": "m", "value": 1.0, "unit": "sec",
             "queries": q, "full_queries": fq, "sf": 0.1}
        ))
        runs.append(str(p))
    out = tmp_path / "min.json"
    subprocess.run(
        [_sys.executable, "scripts/pair_min.py", str(out), *runs],
        check=True, capture_output=True, cwd="/root/repo",
    )
    got = json.loads(out.read_text())
    assert got["full_queries"] == {"a": 2.0, "b": 1.5}

    mismatch = tmp_path / "mismatch.json"
    mismatch.write_text(json.dumps(
        {"metric": "m", "value": 1.0, "unit": "sec",
         "queries": {"a": 1.0}, "sf": 0.1}
    ))
    p = subprocess.run(
        [_sys.executable, "-O", "scripts/pair_min.py",
         str(out), runs[0], str(mismatch)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode != 0
    assert "different registries" in p.stderr


def test_split_wide_clusters_bounds_bucket_width(spark, tmp_path):
    """Width-bounded split compaction (round 9): a cluster wider than
    ceil(factor * N/K) splits in two along its farthest-pair axis —
    only that cluster's members move, the new centroid mints above the
    stored max, child centroids are the 6dp member means, and the
    artifact swap clears the segment lists. The 0-degree lobe keeps
    the parent id (holds seed_a = min vec_id); the 40-degree lobe
    (farthest from seed_a) becomes the new child."""
    import json
    import math
    import os

    from elt_data4transformation_spark.operators import artifacts, vectors

    def unit(deg):
        r = math.radians(deg)
        return [round(math.cos(r), 6), round(math.sin(r), 6), 0.0, 0.0]

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cent = spark.createDataFrame(
        [(0, unit(20.0)), (1, unit(90.0))],
        "centroid_id long, cv array<double>",
    )
    cent.write.parquet(f"{idx}/centroids")
    # cluster 0 is FAT and bimodal: lobe at 0-4 deg (vec 1..5), lobe
    # at 40-44 deg (vec 11..15); cluster 1 holds 3 vectors near 90
    rows = (
        [(i, unit(float(i - 1))) for i in range(1, 6)]
        + [(10 + i, unit(39.0 + i)) for i in range(1, 6)]
        + [(100 + i, unit(89.0 + i)) for i in range(1, 4)]
    )
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    vectors.assign_nearest(df, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index")
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    before = spark.read.parquet(f"{idx}/index")
    assert before.filter(F.col("centroid_id") == 0).count() == 10
    # N=13, K=2 -> bound = ceil(1.2 * 6.5) = 8; only cluster 0 is wider
    assert vectors.split_wide_clusters(spark, idx, width_factor=1.2) == 1

    after = spark.read.parquet(f"{idx}/index")
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in after.select("vec_id", "centroid_id").collect()
    }
    assert set(got) == {r[0] for r in rows}, "members lost or invented"
    assert all(got[i] == 0 for i in range(1, 6)), "seed_a lobe moved"
    assert all(got[10 + i] == 2 for i in range(1, 6)), "far lobe not split"
    assert all(got[100 + i] == 1 for i in range(1, 4)), "thin cluster moved"

    cents = {
        r["centroid_id"]: r["cv"]
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    assert set(cents) == {0, 1, 2}
    # child centroid = 6dp elementwise mean of its members
    exp = [
        sum(unit(float(i - 1))[d] for i in range(1, 6)) / 5.0
        for d in range(4)
    ]
    # 6dp-rounded mean; Spark rounds HALF_UP vs Python's banker's, so
    # compare within one ulp of the rounding grain
    assert all(abs(a - b) <= 1e-6 for a, b in zip(cents[0], exp))
    assert cents[1] == unit(90.0), "unsplit centroid must stay frozen"
    meta = artifacts.load_meta(idx)
    assert meta["ingests"] == [] and meta["deletes"] == []
    # every bucket is now inside the recomputed bound
    widths = [
        r["c"]
        for r in after.groupBy("centroid_id").agg(F.count("*").alias("c"))
        .collect()
    ]
    assert max(widths) <= math.ceil(1.2 * 13 / 3)


def test_split_wide_clusters_degenerate_and_noop(spark, tmp_path):
    """An all-identical fat cluster cannot split (every member ties to
    seed_a): the pass processes it but mints no new centroid and moves
    nothing — and the return value counts clusters ACTUALLY split
    (minted children), so the degenerate pass returns 0 (round 10; it
    previously returned clusters processed, overcounting by one on
    split_until_bounded's terminating pass). A below-bound index is a
    NO-OP (returns 0, no swap)."""
    import json
    import math
    import os

    from elt_data4transformation_spark.operators import artifacts, vectors

    def unit(deg):
        r = math.radians(deg)
        return [round(math.cos(r), 6), round(math.sin(r), 6), 0.0, 0.0]

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cent = spark.createDataFrame(
        [(0, unit(0.0)), (1, unit(90.0))],
        "centroid_id long, cv array<double>",
    )
    cent.write.parquet(f"{idx}/centroids")
    rows = [(i, unit(0.0)) for i in range(1, 11)] + [
        (100 + i, unit(89.0 + i)) for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    vectors.assign_nearest(df, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index")
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    assert vectors.split_wide_clusters(spark, idx, width_factor=1.2) == 0
    after = spark.read.parquet(f"{idx}/index")
    assert after.filter(F.col("centroid_id") == 0).count() == 10
    cents = {
        r["centroid_id"]
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    assert cents == {0, 1}, "degenerate split must mint no id"

    # widths all inside a generous bound -> untouched, no swap
    mtime = os.path.getmtime(os.path.join(idx, artifacts.META_NAME))
    assert vectors.split_wide_clusters(spark, idx, width_factor=5.0) == 0
    assert os.path.getmtime(os.path.join(idx, artifacts.META_NAME)) == mtime


def test_split_until_bounded_absolute_width(spark, tmp_path):
    """The ABSOLUTE width bound (max_width) is the scale mode: unlike
    the relative skew bound, it keeps firing as a uniformly grown
    index's buckets exceed the probe budget, and split_until_bounded
    iterates the 2-way splits until every bucket fits. The bimodal
    10-member cluster needs two passes for max_width=3: lobes first
    (5+5), then within-lobe."""
    import json
    import math
    import os

    from elt_data4transformation_spark.operators import artifacts, vectors

    def unit(deg):
        r = math.radians(deg)
        return [round(math.cos(r), 6), round(math.sin(r), 6), 0.0, 0.0]

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cent = spark.createDataFrame(
        [(0, unit(20.0)), (1, unit(90.0))],
        "centroid_id long, cv array<double>",
    )
    cent.write.parquet(f"{idx}/centroids")
    rows = (
        [(i, unit(float(i - 1))) for i in range(1, 6)]
        + [(10 + i, unit(39.0 + i)) for i in range(1, 6)]
        + [(100 + i, unit(89.0 + i)) for i in range(1, 4)]
    )
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    vectors.assign_nearest(df, cent).drop("cos").write.partitionBy(
        "centroid_id"
    ).parquet(f"{idx}/index")
    with open(os.path.join(idx, artifacts.META_NAME), "w") as fh:
        json.dump({"fingerprint": "t", "ingests": []}, fh)

    assert vectors.split_until_bounded(spark, idx, max_width=3) >= 2
    after = spark.read.parquet(f"{idx}/index")
    widths = [
        r["c"]
        for r in after.groupBy("centroid_id").agg(F.count("*").alias("c"))
        .collect()
    ]
    assert max(widths) <= 3
    assert after.count() == len(rows), "members lost or invented"
    k = spark.read.parquet(f"{idx}/centroids").count()
    assert k == len(widths), "centroid table out of sync with buckets"


def test_split_index_recall_dominates_fixed_k_at_matched_budget(spark, tmp_path):
    """SCALE.md round-9 claim, pinned as an invariant (round-10 verdict
    ask #4): at a MATCHED scan budget, multi-probe over the
    width-bounded SPLIT index recovers at least the recall of the
    fixed-K single-probe index (measured 0.438 vs 0.295 at the 100k
    stress; the split turns one coarse all-or-nothing bucket into a
    fine nprobe knob). Fixture: the sf0.001 embeddings replicated 10x
    with the cyclic-shift decorrelation scripts/split_stress.py uses —
    deterministic, no RNG. The budget match is ASSERTED from the actual
    scanned-pair counts, not assumed from the width arithmetic."""
    import math
    from functools import reduce

    from pyspark.sql import Window

    from elt_data4transformation_spark.operators import artifacts
    from elt_data4transformation_spark.operators.vectors import (
        cosine_col,
        split_until_bounded,
    )
    from elt_data4transformation_spark.plans.similarity import _ivf_builder
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base_n = emb.agg(F.max("vec_id")).first()[0] + 1
    parts = []
    for i in range(10):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * base_n))
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
    ).localCheckpoint(eager=True)
    n = vec.count()

    idx_path = str(tmp_path / "idx")
    artifacts.publish(idx_path, "recall-budget-test", _ivf_builder(vec))

    SAMPLE, TOPK = 50, 5
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")

    def top5(joined):
        return (
            joined.filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine_col("qv", "v"), 6).alias("cos"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOPK)
            .select("query_id", "neighbor_id")
        )

    brute = top5(
        vec.crossJoin(
            F.broadcast(
                vec.filter(F.col("vec_id") < SAMPLE).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                )
            )
        )
    ).localCheckpoint(eager=True)

    def single_probe():
        idx = spark.read.parquet(f"{idx_path}/index")
        q = idx.filter(F.col("vec_id") < SAMPLE).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("centroid_id").alias("qc"),
        )
        joined = idx.join(
            F.broadcast(q), F.col("centroid_id") == F.col("qc")
        )
        scanned = joined.count()
        hits = top5(joined).join(brute, ["query_id", "neighbor_id"]).count()
        return scanned, hits / (TOPK * SAMPLE)

    def multi_probe(p, count_only=False):
        idx = spark.read.parquet(f"{idx_path}/index")
        cent = spark.read.parquet(f"{idx_path}/centroids")
        q = idx.filter(F.col("vec_id") < SAMPLE).select(
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
        joined = idx.join(F.broadcast(qc), "centroid_id")
        scanned = joined.count()
        if count_only:
            return scanned, None
        hits = top5(joined).join(brute, ["query_id", "neighbor_id"]).count()
        return scanned, hits / (TOPK * SAMPLE)

    fixed_scanned, fixed_recall = single_probe()
    split_until_bounded(
        spark, idx_path, max_width=math.ceil(2 * math.sqrt(n))
    )
    # fill the fixed-K budget: the finest knob the split buys is more
    # probes per query — pick the largest p whose ACTUAL scanned-pair
    # count stays within the fixed-K single-probe budget
    s1, _ = multi_probe(1, count_only=True)
    p = max(1, fixed_scanned // max(s1, 1))
    while p > 1 and multi_probe(p, count_only=True)[0] > fixed_scanned:
        p -= 1
    split_scanned, split_recall = multi_probe(p)

    assert split_scanned <= fixed_scanned, (
        f"budget not matched: split scans {split_scanned} pairs vs "
        f"fixed-K's {fixed_scanned} — the comparison would be unfair"
    )
    assert split_recall >= fixed_recall, (
        f"split recall {split_recall} below fixed-K {fixed_recall} at "
        f"budget {split_scanned} <= {fixed_scanned}"
    )


def test_ensure_split_ivf_crash_idempotent(spark):
    """A crash between split_wide_clusters' artifact swap and the final
    fp_split stamp leaves the index ALREADY SPLIT but stamped with the
    pre-split fingerprint (round-9 ADVICE: without the distinct
    intermediate stamp, the rerun accepted the artifact as the maintain
    state and ran a SECOND split pass over already-split buckets —
    at factor 1.1 that can split more clusters and silently diverge
    from the one-pass oracle). The rerun must instead rebuild from
    scratch and converge to the identical one-pass result."""
    from elt_data4transformation_spark.operators import artifacts
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans import similarity as S
    from tests.conftest import SF_SMALL

    path = S._ensure_split_ivf(spark, SF_SMALL)
    clean = REGISTRY["ann_ivf_split_compact"].fn(spark, SF_SMALL).collect()
    k_clean = spark.read.parquet(f"{path}/centroids").count()

    # simulate the crash window: content already split, meta still at
    # the pre-split mark (exactly what the ensure path stamps before
    # calling split_wide_clusters — the swap carries it forward)
    fp_presplit, fp_split = S._split_ivf_fps(SF_SMALL)
    artifacts.update_meta(path, fp_presplit)

    again = REGISTRY["ann_ivf_split_compact"].fn(spark, SF_SMALL).collect()
    assert spark.read.parquet(f"{path}/centroids").count() == k_clean, (
        "rerun after simulated crash changed the centroid count — a "
        "second split pass ran over the already-split index"
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in clean]
    assert artifacts.load_meta(path)["fingerprint"] == fp_split


def test_ann_ivf_split_nprobe_recall_dominates_single_probe(spark):
    """The nprobe twin over the split index must recover recall: its
    per-query neighbor sets vs brute force can only improve on the
    single-probe split query's (it searches a superset of buckets —
    the home bucket ranks in the top-NPROBE by construction of the
    assignment ordering only approximately, so gate on >=, measured
    equal-or-better at the fixtures)."""
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].fn(spark, SF_SMALL).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_split_compact"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_split_nprobe"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    r_single = len(bf & single) / len(bf)
    r_multi = len(bf & multi) / len(bf)
    # the single-probe home bucket comes from the Lloyd re-side
    # assignment, not from ranking the FINAL recomputed centroid
    # table, so it lands in a query's top-NPROBE buckets only
    # approximately — gate with a small tolerance instead of a strict
    # superset claim a fixture change could flake (round-9 ADVICE);
    # measured equal-or-better at every SF fixture
    assert r_multi >= r_single - 0.05, (
        f"nprobe recall {r_multi} below single-probe {r_single}"
    )
    assert r_multi >= 0.5, f"split-nprobe recall {r_multi} below 0.5"


def test_winnow_maintain_lifecycle_appends_never_rewrites(spark):
    """The maintained winnow store is LSM-shaped: the delta append
    leaves the published base segment byte-identical (same file set),
    a re-ensure is a no-op at the stamped fingerprint, and a crashed
    append (segment present, meta still at the base fingerprint) is
    an ignored orphan the rerun overwrites before restamping — the
    final spans match the never-crashed run exactly."""
    import os

    from elt_data4transformation_spark.operators import artifacts
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans import dedup as D
    from tests.conftest import SF_SMALL

    path = D._ensure_winnow_maintain_store(spark, SF_SMALL)

    def listing(seg):
        return sorted(
            (f, os.path.getmtime(os.path.join(path, seg, f)))
            for f in os.listdir(os.path.join(path, seg))
            if f.endswith(".parquet")
        )

    base_files = listing("anchors")
    meta = artifacts.load_meta(path)
    assert meta["ingests"] == ["delta"]

    # segments hold ONLY their own docs: maintenance never re-winnowed
    # the base (delta-proportional by construction)
    mods = {
        r[0] % D.DELTA_MOD
        for r in spark.read.parquet(f"{path}/anchors_delta")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert mods == {0}, f"delta segment holds base docs: {mods}"

    before = [
        tuple(r)
        for r in REGISTRY["substring_winnow_maintain"]
        .fn(spark, SF_SMALL)
        .collect()
    ]

    # re-ensure: current fingerprint -> no-op, base untouched
    assert D._ensure_winnow_maintain_store(spark, SF_SMALL) == path
    assert listing("anchors") == base_files

    # simulated crash window: delta segment on disk, meta rolled back
    # to the base fingerprint (the append's stamp never happened)
    src = [os.path.join(SF_SMALL, "documents.parquet")]
    params = (
        f"wsub_maintain|base=doc_id%{D.DELTA_MOD}!=0"
        f"|k={D._WSUB_K}|w={D._WSUB_W}|m={D._WSUB_M}"
    )
    artifacts.update_meta(
        path, artifacts.source_fingerprint(src, params + "|ingests=")
    )
    assert D._ensure_winnow_maintain_store(spark, SF_SMALL) == path
    assert artifacts.load_meta(path)["ingests"] == ["delta"]
    assert listing("anchors") == base_files, "rerun rewrote the base"
    after = [
        tuple(r)
        for r in REGISTRY["substring_winnow_maintain"]
        .fn(spark, SF_SMALL)
        .collect()
    ]
    assert after == before


def test_winnow_delete_unshares_spans_monotonically(spark):
    """The takedown probe RECOMPUTES sharing over the surviving corpus
    — it is not a filter of the full-corpus spans: a span whose only
    duplicate partner was tombstoned must vanish, and no span may
    appear that the full corpus didn't have (deletion only removes
    sharing). The sf0.001 fixture exercises both directions: 4 spans
    survive the naive filter but not the recompute."""
    from elt_data4transformation_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    dele = [
        tuple(r)
        for r in REGISTRY["substring_winnow_delete"]
        .fn(spark, SF_SMALL)
        .collect()
    ]
    full_kept = {
        tuple(r)
        for r in REGISTRY["substring_dup_spans_winnowed"]
        .fn(spark, SF_SMALL)
        .collect()
        if r.doc_id % 10 != 7
    }
    # deletion can only REMOVE sharing: every surviving span must sit
    # inside some full-corpus span of the same doc (tuple-identical
    # when untouched, strictly contained when an island lost the
    # anchors it shared with a tombstoned doc)
    for doc_id, start, end, _len, _n in dele:
        assert any(
            d == doc_id and s <= start and end <= e
            for d, s, e, _l, _a in full_kept
        ), f"takedown minted a span the corpus lacked: {doc_id}"
    assert len(full_kept) > len(dele), (
        "fixture no longer exercises takedown un-sharing — no span "
        "was shared solely with a tombstoned doc"
    )


def test_winnow_compact_folds_exactly(spark):
    """Compaction changes layout, never content: the folded store's
    anchor row set is EXACTLY (maintained base ∪ delta segment) minus
    the tombstoned docs, in one segment, with the maintained store
    left untouched — the LSM fold invariant the dedup-index family
    pins, applied to the winnow family."""
    import os

    from elt_data4transformation_spark.operators import artifacts
    from elt_data4transformation_spark.plans import dedup as D
    from tests.conftest import SF_SMALL

    cpath = D._ensure_winnow_compact_store(spark, SF_SMALL)
    mpath = D._ensure_winnow_maintain_store(spark, SF_SMALL)

    folded = {
        tuple(r) for r in spark.read.parquet(f"{cpath}/anchors").collect()
    }
    expected = {
        tuple(r)
        for r in spark.read.parquet(f"{mpath}/anchors")
        .unionByName(spark.read.parquet(f"{mpath}/anchors_delta"))
        .filter("doc_id % 10 != 7")
        .collect()
    }
    assert folded == expected
    # one clean segment; the fold is recorded in meta
    segs = [
        f
        for f in os.listdir(cpath)
        if os.path.isdir(os.path.join(cpath, f))
    ]
    assert segs == ["anchors"]
    meta = artifacts.load_meta(cpath)
    assert meta["folded"] == ["base", "delta"]
    assert meta["deletes"] == ["d7"]
    # the maintained store still holds BOTH its segments (compaction
    # wrote a new artifact, it did not cannibalize its input)
    assert os.path.isdir(f"{mpath}/anchors")
    assert os.path.isdir(f"{mpath}/anchors_delta")


def test_stream_substring_guard_flags_eval_quotes(spark):
    """The streaming guard must exercise BOTH dispositions at the
    fixture (hits prove the probe path, cleans prove the left join),
    and a contaminated doc's longest span must satisfy the winnowing
    floor arithmetic: a single shared anchor is a K-char span, so
    max_span_len >= K with n_dup_spans >= 1, and clean docs carry
    NULLs. sf0.01 is the smallest fixture whose arrivals contain a
    verbatim eval quote (doc 45, one 419-char span); sf0.001's
    arrivals are all clean."""
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.plans.dedup import _WSUB_K

    rows = (
        REGISTRY["stream_substring_guard"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    by_status = {"clean": [], "contaminated": []}
    for r in rows:
        by_status[r.status].append(r)
    assert by_status["contaminated"], "fixture has no eval-quote hits"
    assert by_status["clean"], "fixture has no clean arrivals"
    for r in by_status["contaminated"]:
        assert r.n_dup_spans >= 1
        assert r.max_span_len >= _WSUB_K
    for r in by_status["clean"]:
        assert r.n_dup_spans is None and r.max_span_len is None


def test_decontamination_excise_conserves_characters(spark):
    """The excision is an exact surgery: for every arriving doc,
    len(clean_text) + chars_cut == len(original text); contaminated
    docs shrink by exactly their span mass and the excised text no
    longer contains the removed quote's middle (the doc-45 fixture:
    one 419-char eval quote), while clean docs pass through
    byte-identical."""
    from elt_data4transformation_spark.plans import REGISTRY
    from elt_data4transformation_spark.sources import table

    SF = "/root/testdata/sf0.01"
    out = {
        r.doc_id: r
        for r in REGISTRY["decontamination_excise"].fn(spark, SF).collect()
    }
    orig = {
        r.doc_id: r.text
        for r in table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
        if r.doc_id in out
    }
    cut_docs = [d for d, r in out.items() if r.n_cut > 0]
    assert cut_docs == [45], f"fixture drifted: cut docs {cut_docs}"
    for d, r in out.items():
        assert len(r.clean_text) + r.chars_cut == len(orig[d]), d
        if r.n_cut == 0:
            assert r.clean_text == orig[d], d
    r45 = out[45]
    assert r45.chars_cut == 419
    # the removed middle of the quote is gone from the clean text
    guard = {
        g.doc_id: g
        for g in REGISTRY["stream_substring_guard"].fn(spark, SF).collect()
    }
    assert guard[45].max_span_len == 419
