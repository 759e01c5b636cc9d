"""Like-for-like DuckDB bench forms for the stored-artifact queries
(round-7 VERDICT ask #1, closing the standing measurement asterisk).

The Spark side of the ~20 ``prepare``-tagged queries probes a PREBUILT
store (signatures / IVF centroid assignments / fingerprint band keys /
winnow anchors), published once per corpus state by the registry
prepare hook and run UNTIMED by bench.py. Their DuckDB oracles, by
contrast, recompute that store from raw data inline on every timed run
— so the published ratios compared Spark's amortized steady-state
probe against a DuckDB full rebuild (documented in BENCH_NOTES.md).

This module derives, for each such query, an equivalent PREPARED form:

- ``prepare`` statements that materialize the oracle's store CTEs as
  DuckDB temp tables (run untimed, content-addressed so identical
  stores are built once per connection — the duck twin of the Spark
  artifact store's fingerprint reuse), and
- a ``probe`` SQL string — the original oracle with each store CTE's
  body replaced by a read of its temp table.

The rewrite is purely mechanical (balanced-paren CTE extraction; no
semantic edits), and tests/test_duck_prepared.py pins that every
prepared probe returns byte-identical results to its full oracle. The
REGISTERED oracles are untouched: the driver's correctness harness and
the exact-hash audit keep running the self-contained forms.

Which CTEs constitute "the store" mirrors what the Spark prepare hook
publishes (plans/dedup.py, plans/similarity.py, operators/multimodal
fingerprint stores):

- MinHash signature store (_sigstore): ``sh`` (shingle sets) +
  ``bands`` (LSH band keys) — signatures are computed at document
  ARRIVAL and stored beside it; every probe reads them.
- IVF index (ann_* / stream_ivf_ingest): ``assigned`` (trained
  centroids + per-vector assignments after the lifecycle's
  merges/deletes/compaction — each query's own chain).
- Perceptual fingerprint stores (image/audio/video_neardup):
  ``bands`` (Hamming band keys, decoded at publication).
- Winnowing anchor store (substring_dup_spans_winnowed): ``anchors``.
- SRP band store (embedding_neardup_srp): ``bands`` (the 24-plane
  sign-bit folds — the store's whole point; the rescore reads raw
  vectors on both engines).
"""

from __future__ import annotations

import hashlib
import re

# query -> ordered store-CTE names to materialize (dependency order)
PREPARED_STORE_CTES: dict[str, list[str]] = {
    "dedup_stored_index": ["sh", "bands"],
    "dedup_index_maintain": ["sh", "bands"],
    "dedup_index_delete": ["sh", "bands"],
    "dedup_index_compact": ["sh", "bands"],
    "dedup_minhash_lsh": ["sh", "bands"],
    "source_overlap_matrix": ["sh", "bands"],
    "dedup_components": ["sh", "bands"],
    "decontamination_fuzzy": ["sh", "bands"],
    "stream_decontaminate": ["sh", "bands"],
    "stream_index_ingest": ["sh", "bands"],
    "stream_index_probe": ["sh", "bands"],
    "embedding_neardup_srp": ["bands"],
    "image_neardup": ["bands"],
    "audio_neardup": ["bands"],
    "video_neardup": ["bands"],
    "substring_dup_spans_winnowed": ["anchors"],
    # maintained store = base segment + delta segment; their union is
    # exactly the full-corpus anchor set the oracle's CTE computes
    "substring_winnow_maintain": ["anchors"],
    # the takedown probe reads the shared full-corpus store minus the
    # tombstone list; the oracle's anchors CTE is the surviving set
    "substring_winnow_delete": ["anchors"],
    # the folded store IS the surviving-corpus anchor set
    "substring_winnow_compact": ["anchors"],
    # the guard probes stored anchors (full-corpus artifact) against
    # the test split's fp slice of the same store
    "stream_substring_guard": ["anchors"],
    # the excision reuses the guard's stored-anchor probe
    "decontamination_excise": ["anchors"],
    # round 11: substring_dup_spans (raw) is timed end-to-end again —
    # no prepare hook, no stored component on either engine — so it is
    # deliberately ABSENT from this map (the map covers exactly the
    # prepare-tagged queries; see test_duck_prepared).
    # The declared stored-probe variant: the winnow anchor store and
    # the derived shared-doc prefilter are published artifacts on the
    # Spark side, so the duck twin materializes the same two tables
    "substring_dup_spans_gated": ["anchors", "shared_docs"],
    "ann_stored_ivf": ["assigned"],
    "ann_ivf_maintain": ["assigned"],
    "ann_ivf_delete": ["assigned"],
    "ann_ivf_compact": ["assigned"],
    # the split store is the post-split index; cent, wide and sided
    # are also materialized because the probe's n_centroids scalar
    # reads them (round 10: the scalar now mirrors the stored table —
    # unsplit cent rows + distinct child ids — so it references wide)
    "ann_ivf_split_compact": ["cent", "wide", "sided", "final_idx"],
    # nprobe twin over the same artifact: the probe ranks the final
    # centroid table and scans the final index
    "ann_ivf_split_nprobe": ["final_cent", "final_idx"],
    "stream_ivf_ingest": ["assigned"],
}

_CTE_HEAD = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", re.I)


def extract_ctes(sql: str) -> list[tuple[str, str, int, int]]:
    """Every ``name AS ( body )`` occurrence at ANY nesting depth, in
    source order: (name, body, body_start, body_end). Balanced-paren
    scan aware of single-quoted strings ('' escapes) and -- comments,
    so md5('...') literals and commented parens can't derail it."""
    out = []
    i = 0
    while True:
        mm = _CTE_HEAD.search(sql, i)
        if not mm:
            return out
        j = mm.end()
        depth = 1
        k = j
        while depth:
            c = sql[k]
            if c == "'":
                k += 1
                while True:
                    if sql[k] == "'":
                        if sql[k + 1 : k + 2] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == "-" and sql[k + 1 : k + 2] == "-":
                k = sql.index("\n", k)
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        out.append((mm.group(1), sql[j : k - 1], j, k - 1))
        i = mm.end()  # continue INSIDE the body: nested CTEs are seen


def prepared_form(
    oracle: str, materialize: list[str]
) -> tuple[list[tuple[str, str]], str]:
    """Return ([(temp_table, CREATE ... AS select)], probe_sql).

    Temp-table names are content-addressed (md5 of the defining
    select), so two queries whose store definitions are textually
    identical — the whole signature-store family — share one build.
    """
    spans = extract_ctes(oracle)
    first: dict[str, tuple[str, int, int]] = {}
    for name, body, a, b in spans:
        first.setdefault(name, (body, a, b))
    names = list(first)
    order = {n: i for i, n in enumerate(names)}
    refs = {
        n: sorted(
            {
                m
                for m in names
                if m != n and re.search(rf"\b{m}\b", first[n][0])
            },
            key=order.get,
        )
        for n in names
    }

    created: dict[str, str] = {}
    stmts: list[tuple[str, str]] = []
    for target in materialize:
        need: list[str] = []
        seen: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            seen.add(n)
            if n not in created:  # created deps are table reads
                for d in refs[n]:
                    visit(d)
            need.append(n)

        for d in refs[target]:
            visit(d)
        parts = []
        for n in sorted(need, key=order.get):
            if n in created:
                parts.append(f"{n} AS (SELECT * FROM {created[n]})")
            else:
                parts.append(f"{n} AS ({first[n][0]})")
        prefix = f"WITH {', '.join(parts)} " if parts else ""
        select = prefix + first[target][0]
        tbl = "prep_" + hashlib.md5(select.encode()).hexdigest()[:12]
        stmts.append((tbl, f"CREATE TEMP TABLE {tbl} AS {select}"))
        created[target] = tbl

    # rewrite the oracle: store CTE bodies become temp-table reads
    # (replace back-to-front so recorded spans stay valid)
    probe = oracle
    for target in sorted(
        materialize, key=lambda t: -first[t][1]
    ):
        _, a, b = first[target]
        probe = probe[:a] + f"SELECT * FROM {created[target]}" + probe[b:]
    return stmts, probe


def ensure_prepared(con, name: str, oracle: str, built: set[str]) -> str:
    """Run the (untimed) prepare statements for ``name`` on ``con``,
    skipping temp tables already built this connection; return the
    probe SQL. ``built`` is the caller's per-connection cache."""
    stmts, probe = prepared_form(oracle, PREPARED_STORE_CTES[name])
    for tbl, ddl in stmts:
        if tbl not in built:
            con.execute(ddl)
            built.add(tbl)
    return probe
