"""Mergeable frequency sketches — the heavy-hitters prefilter.

Misra-Gries (Misra & Gries 1982, the k-counter generalization of
Boyer-Moore majority): one pass, at most k counters. Decrement-all on
overflow guarantees any item with stream count > n/k still holds a
counter at the end. Run per partition, the union of per-partition
survivors is a SUPERSET of every GLOBAL item with count > n_total/k
(pigeonhole: a global heavy hitter must be partition-local heavy in
at least one partition), so an exact recount restricted to the
candidates reproduces the exact heavy-hitter set — sketch for scale,
recount for exactness. Reference analog: A8 frequency histograms
(SURVEY §2.5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def misra_gries(values: Iterator, k: int) -> dict:
    """One Misra-Gries pass; returns the surviving counters (item ->
    residual count, at most k entries). The residuals UNDERCOUNT true
    frequencies (by up to n/k) — callers wanting exact counts recount
    the surviving keys."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def misra_gries_batches(
    batches: Iterator[pd.DataFrame],
    col: str,
    k: int,
    total_col: str | None = None,
) -> Iterator[pd.DataFrame]:
    """mapInPandas adapter: fold every Arrow batch of ONE partition
    through a single shared Misra-Gries state (the iterator form hands
    a partition's batches sequentially), emit the surviving candidate
    items once at partition end — bounded k-row output per task no
    matter the partition size. With ``total_col``, the partition's
    exact item count rides along as ONE extra sentinel row
    (item NULL, total n_p) — the stream length the n/k threshold
    needs, measured in the same single pass instead of a separate
    full-scan count job."""
    counters: dict = {}
    n = 0
    for pdf in batches:
        n += len(pdf)
        for v in pdf[col]:
            if v in counters:
                counters[v] += 1
            elif len(counters) < k:
                counters[v] = 1
            else:
                dead = [key for key in counters if counters[key] == 1]
                for key in counters:
                    counters[key] -= 1
                for key in dead:
                    del counters[key]
    keys = list(counters.keys())
    if total_col is None:
        yield pd.DataFrame({col: keys})
    else:
        yield pd.DataFrame(
            {
                col: keys + [None],
                total_col: [None] * len(keys) + [n],
            }
        )
