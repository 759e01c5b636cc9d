"""Ingestion-layer connector primitives (SURVEY §2.1 S13/S14/S26),
re-expressed as pure, testable functions — the engine-facing surface of
the reference's async HTTP connectors — plus ``HttpFetcher``, the LIVE
execution layer that drives those primitives over a real socket
(stdlib urllib; integration-tested against an in-process localhost
HTTP server, no external network).

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

import json as _json
import time as _time
import urllib.error
import urllib.parse
import urllib.request
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


class FetchError(RuntimeError):
    """A request failed after exhausting the retry schedule."""


def parse_retry_after(value: str | None) -> float | None:
    """Seconds to wait from a Retry-After header, or None when absent
    or unparseable (caller falls back to exponential backoff). Accepts
    both RFC-7231 forms: delta-seconds and HTTP-date."""
    if value is None:
        return None
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(value)
        return max(0.0, dt.timestamp() - _time.time())
    except (ValueError, TypeError, OverflowError):
        return None


class HttpFetcher:
    """LIVE execution of the connector primitives: paginate +
    sliding-window rate limiter + exponential backoff (Retry-After
    honoured, capped) + conditional-GET (ETag/If-None-Match, 304),
    over a real socket via stdlib urllib.

    Mirrors the reference retry/request loop
    (connectors/base_connector.py:104-135 — rate-limit wait, bearer
    auth header, JSON/text envelope, ``retry_delay * 2^attempt``
    backoff, raise after max retries) and its generic page/per_page
    pagination (:185-224, stop on empty/short ``data``). Clock and
    sleep are injectable so integration tests stay deterministic and
    fast; production callers use the wall-clock defaults.

    Acquisition is an ingest concern, not a query concern: records a
    fetcher drains land in Spark via ``ingest_paginated`` below
    (driver-side createDataFrame — connector APIs are bounded feeds;
    a URL list big enough to matter fans out via mapInPandas with one
    fetcher per task instead)."""

    def __init__(
        self,
        base_url: str,
        api_key: str | None = None,
        max_requests: int = 100,
        window_s: float = 60.0,
        max_retries: int = 3,
        retry_base_s: float = 1.0,
        backoff_cap_s: float = 30.0,
        retry_after_cap_s: float = 120.0,
        timeout_s: float = 10.0,
        cache: ConditionalGetCache | None = None,
        clock: Callable[[], float] = _time.monotonic,
        sleep: Callable[[float], None] = _time.sleep,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.limiter = SlidingWindowRateLimiter(max_requests, window_s)
        self.max_retries = max_retries
        self.retry_base_s = retry_base_s
        self.backoff_cap_s = backoff_cap_s
        self.retry_after_cap_s = retry_after_cap_s
        self.timeout_s = timeout_s
        self.cache = cache if cache is not None else ConditionalGetCache()
        self._clock = clock
        self._sleep = sleep
        self.request_count = 0  # includes retries; tests assert on it

    def _auth_headers(self) -> dict[str, str]:
        return (
            {"Authorization": f"Bearer {self.api_key}"}
            if self.api_key
            else {}
        )

    def _open(self, url: str, headers: dict[str, str], data: bytes | None = None):
        req = urllib.request.Request(
            url,
            headers=headers,
            method="GET" if data is None else "POST",
            data=data,
        )
        return urllib.request.urlopen(req, timeout=self.timeout_s)

    def post_json(self, endpoint: str, payload: dict) -> dict | None:
        """One logical POST of a JSON body under the SAME protocol as
        request_json (rate-limit wait, bearer auth, Retry-After-aware
        backoff on 429/5xx, raise after max retries) — the call shape
        of a batched model-annotation endpoint: the LLM operators POST
        a prompt and decode the JSON envelope. No conditional-GET
        (POSTs are not cacheable)."""
        body = _json.dumps(payload).encode()
        return self.request_json(endpoint, _post_body=body)

    def request_json(
        self,
        endpoint: str,
        params: dict | None = None,
        cache_key: str | None = None,
        _post_body: bytes | None = None,
    ) -> dict | None:
        """One logical GET (or POST via post_json) with the full
        reference protocol. Returns the decoded JSON envelope
        ({'content': text} for non-JSON), or None when a conditional
        GET answered 304 Not Modified."""
        url = f"{self.base_url}/{endpoint.lstrip('/')}"
        if params:
            url += "?" + urllib.parse.urlencode(params)
        method = "GET" if _post_body is None else "POST"
        headers = self._auth_headers()
        if _post_body is not None:
            headers["Content-Type"] = "application/json"
        if cache_key:
            headers.update(self.cache.headers_for(cache_key))
        last_exc: Exception | None = None
        for attempt in range(self.max_retries + 1):
            wait = self.limiter.wait_time(self._clock())
            if wait > 0:
                self._sleep(wait)
            self.limiter.record(self._clock())
            self.request_count += 1
            try:
                with self._open(url, headers, _post_body) as resp:
                    if cache_key:
                        self.cache.update(
                            cache_key,
                            etag=resp.headers.get("ETag"),
                            last_modified=resp.headers.get("Last-Modified"),
                        )
                    body = resp.read()
                    ctype = resp.headers.get("Content-Type", "")
                    if "application/json" in ctype:
                        return _json.loads(body)
                    return {"content": body.decode("utf-8", "replace")}
            except urllib.error.HTTPError as exc:
                if exc.code == 304 and cache_key:
                    return None  # fresh — skip re-ingest
                if exc.code in (429, 500, 502, 503, 504):
                    last_exc = exc
                    if attempt < self.max_retries:
                        # Retry-After (either RFC-7231 form) wins on
                        # WHICHEVER attempt it arrives, capped like the
                        # schedule in ``backoff_delays``; unparseable or
                        # absent -> exponential.
                        ra = parse_retry_after(
                            exc.headers.get("Retry-After")
                        )
                        delay = (
                            min(ra, self.retry_after_cap_s)
                            if ra is not None
                            else min(
                                self.retry_base_s * (2**attempt),
                                self.backoff_cap_s,
                            )
                        )
                        self._sleep(delay)
                        continue
                raise FetchError(
                    f"{method} {url} failed: HTTP {exc.code}"
                ) from exc
            except urllib.error.URLError as exc:
                last_exc = exc
                if attempt < self.max_retries:
                    self._sleep(
                        min(
                            self.retry_base_s * (2**attempt),
                            self.backoff_cap_s,
                        )
                    )
                    continue
        raise FetchError(f"{method} {url} failed after retries") from last_exc

    def paginate(
        self,
        endpoint: str,
        per_page: int = 100,
        params: dict | None = None,
        max_pages: int | None = None,
    ) -> Iterator[dict]:
        """Drain a page/per_page endpoint through ``request_json`` —
        the live twin of module-level ``paginate`` (same stop
        condition: short or empty ``data`` page)."""

        def fetch_page(page: int, size: int) -> Sequence[dict]:
            q = dict(params or {})
            q.update({"page": page, "per_page": size})
            env = self.request_json(endpoint, q)
            if env is None:
                return []
            return env.get("data", [])

        return paginate(fetch_page, per_page=per_page, max_pages=max_pages)


def ingest_paginated(
    spark,
    fetcher: HttpFetcher,
    endpoint: str,
    schema: str,
    per_page: int = 100,
    params: dict | None = None,
):
    """Drain a live paginated endpoint into a DataFrame with the given
    DDL schema — the acquisition step that lands connector records in
    a source table (reference pattern: fetched payloads -> staging
    load, elt/loader side)."""
    rows = list(fetcher.paginate(endpoint, per_page=per_page, params=params))
    return spark.createDataFrame(rows, schema=schema)
