"""Batched LLM annotation over Arrow batches — the T10 call shape.

The reference's extractor (study_scraper/extractors/llm_v1.py:216-312)
sends each document's prompt to a chat-completion endpoint and parses
the model's JSON answer; its tests stub the network and exercise the
parser. Here the same shape is Spark-first: ``llm_annotate_batched``
is a ``mapInPandas`` stage — prompts travel as Arrow batches, each
TASK builds ONE ``HttpFetcher`` (connection + rate limiter + retry
schedule shared across the batch's calls, the per-worker client of a
production annotation job) and POSTs one request per row, yielding
``(id, response_json)`` rows the downstream column-level parser
(plans/pipeline.llm_attribution_parse's from_json + grounding /
distribution checks) consumes unchanged.

Scale shape: annotation is embarrassingly parallel and I/O-bound —
parallelism comes from partitions (one fetcher per task, N tasks), the
rate limiter bounds per-task request rate so N tasks respect N*rate,
and failures surface as FetchError task retries rather than silent
nulls. The model response is opaque text until the parser validates
it; rows whose body fails to decode are emitted with a NULL
response_json (quarantine-don't-crash, same policy as the codec
operators). Live calls to a real provider are out of scope (as in the
reference's own tests) — the integration test drives this operator
against an in-process localhost server speaking the same JSON shape
(tests/test_live_fetch.py), proving the batch plumbing end-to-end
over a real socket.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def llm_annotate_batched(
    df: DataFrame,
    base_url: str,
    endpoint: str = "v1/messages",
    id_col: str = "doc_id",
    prompt_col: str = "prompt",
    model: str = "annotator-v1",
    max_tokens: int = 1024,
    api_key: str | None = None,
    fetcher_factory: Callable | None = None,
) -> DataFrame:
    """POST each row's prompt to a messages-style endpoint, one fetcher
    per task, Arrow-batched rows in and out. Returns (id, response_json
    string — the first text block of the response content, or NULL when
    the envelope doesn't parse)."""

    def annotate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.connectors import FetchError, HttpFetcher

        fetcher = (
            fetcher_factory()
            if fetcher_factory is not None
            else HttpFetcher(base_url, api_key=api_key)
        )
        for pdf in batches:
            ids, texts = [], []
            for rid, prompt in zip(pdf[id_col], pdf[prompt_col]):
                try:
                    env = fetcher.post_json(
                        endpoint,
                        {
                            "model": model,
                            "max_tokens": max_tokens,
                            "messages": [
                                {"role": "user", "content": str(prompt)}
                            ],
                        },
                    )
                    blocks = (env or {}).get("content") or []
                    text = next(
                        (
                            b.get("text")
                            for b in blocks
                            if isinstance(b, dict)
                            and b.get("type") == "text"
                        ),
                        None,
                    )
                except FetchError:
                    # exhausted retries for THIS row: quarantine (NULL
                    # response; the parser's schema check rejects it
                    # downstream) instead of failing the whole batch
                    text = None
                ids.append(rid)
                texts.append(text)
            yield pd.DataFrame({id_col: ids, "response_json": texts})

    return df.mapInPandas(annotate, f"{id_col} long, response_json string")
