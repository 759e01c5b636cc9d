"""Ingestion-layer connector primitives (SURVEY §2.1 S13/S14/S26),
re-expressed as pure, testable functions — the engine-facing surface of
the reference's async HTTP connectors, without the network.

- ``paginate``: generic page/per_page pagination driver
  (connectors/base_connector.py:185-224) — the fetch callable is
  injected, so tests (and offline "from_file" modes, the reference's
  own fixture pattern, sources/dawum.py:22-27) supply parsed payloads.
- ``SlidingWindowRateLimiter``: deterministic sliding-window limiter
  (connectors/base_connector.py:27-51); time is injected.
- ``backoff_delays``: bounded exponential backoff schedule with
  Retry-After capping (base_connector.py:104-135; policy bounds
  docs/study_scraper/DECISIONS.md:668-688: <=3 attempts, backoff cap
  30 s, Retry-After cap 120 s).
- ``ConditionalGetCache``: S26 ETag/Last-Modified conditional-GET state
  (storage/postgres.py:562-594) as a plain dict-backed state table; at
  scale this is a small keyed table joined before fetch scheduling.

Records produced by a connector land in Spark via
``spark.createDataFrame(rows, schema)`` (driver-side acquisition) or,
for URL lists big enough to matter, a ``mapInPandas`` fetch stage —
acquisition parallelism is an ingest concern, not a query concern.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass, field


def paginate(
    fetch_page: Callable[[int, int], Sequence[dict]],
    per_page: int = 100,
    start_page: int = 1,
    max_pages: int | None = None,
) -> Iterator[dict]:
    """Drain a paged source: call fetch_page(page, per_page) until a
    short or empty page (the reference's stop condition)."""
    page = start_page
    while max_pages is None or page < start_page + max_pages:
        rows = list(fetch_page(page, per_page))
        yield from rows
        if len(rows) < per_page:
            return
        page += 1


class SlidingWindowRateLimiter:
    """At most ``max_requests`` per ``window_s`` seconds; ``wait_time``
    returns how long a caller must sleep before the next request is
    admissible. Deterministic: the clock is passed in."""

    def __init__(self, max_requests: int = 100, window_s: float = 60.0):
        self.max_requests = max_requests
        self.window_s = window_s
        self._stamps: deque[float] = deque()

    def wait_time(self, now: float) -> float:
        while self._stamps and self._stamps[0] <= now - self.window_s:
            self._stamps.popleft()
        if len(self._stamps) < self.max_requests:
            return 0.0
        return self._stamps[0] + self.window_s - now

    def record(self, now: float) -> None:
        self._stamps.append(now)


def backoff_delays(
    attempts: int = 3,
    base_s: float = 1.0,
    cap_s: float = 30.0,
    retry_after_s: float | None = None,
    retry_after_cap_s: float = 120.0,
) -> list[float]:
    """Delay schedule for up to ``attempts`` retries: exponential
    (base * 2^i) capped at cap_s; an honoured Retry-After header
    overrides the first delay, itself capped (the reference once
    stalled hours on an uncapped Retry-After)."""
    delays = [min(base_s * (2**i), cap_s) for i in range(attempts)]
    if retry_after_s is not None and delays:
        delays[0] = min(retry_after_s, retry_after_cap_s)
    return delays


@dataclass
class ConditionalGetCache:
    """S26: per-key ETag / Last-Modified state; ``headers_for`` yields
    the conditional headers, ``is_fresh`` + ``update`` manage state
    from a response. Backed by a dict locally; the same shape persists
    as a keyed state table at scale."""

    _state: dict[str, dict[str, str]] = field(default_factory=dict)

    def headers_for(self, key: str) -> dict[str, str]:
        st = self._state.get(key) or {}
        h: dict[str, str] = {}
        if "etag" in st:
            h["If-None-Match"] = st["etag"]
        if "last_modified" in st:
            h["If-Modified-Since"] = st["last_modified"]
        return h

    def update(
        self,
        key: str,
        etag: str | None = None,
        last_modified: str | None = None,
    ) -> None:
        st = self._state.setdefault(key, {})
        if etag:
            st["etag"] = etag
        if last_modified:
            st["last_modified"] = last_modified

    def is_fresh(self, key: str, status_code: int) -> bool:
        """304 Not Modified -> skip re-ingest (content unchanged)."""
        return status_code == 304 and key in self._state
