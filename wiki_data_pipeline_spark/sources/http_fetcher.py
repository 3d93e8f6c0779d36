"""Concrete HTTP MediaWiki fetcher — the example implementation behind
the enrichment operator's injectable ``fetcher`` interface (reference:
src/mediawiki_client.py:22-64 ``_make_request`` retry/backoff loop and
:113-171 ``get_article_content``; 429 handling + adaptive limiter gate
src/enhanced_production_mediawiki_client.py:146-186).

Design notes:
- stdlib only (``urllib.request``): no third-party HTTP dependency, so
  the fetcher works on any executor image and tests run against a
  local ``http.server`` fake — hermetic, zero network.
- fits ``operators/enrichment.fetch_enrich(fetcher=...)``: a callable
  ``title -> content``; a missing/redirect page returns None, which
  the enrichment wrapper turns into a dead-letter row (ST4), and HTTP
  failures that exhaust this client's OWN retry budget raise, which
  the wrapper treats as transient at ITS level — two-level retry,
  exactly the reference's client-inside-parallel-executor shape.
- 429 handling is where the adaptive limiter closes the loop: each
  throttled response is recorded (``record_429`` → ×0.8 after 3
  consecutive) and each success resets the streak (``record_success``)
  — the reference's rate-limit gate re-expressed over
  streaming/rate_limiter.py's AdaptiveRateLimiter.
- Spark-pickle-safe: ``__getstate__`` drops the live limiter (it holds
  a threading.Lock) and each executor rebuilds its own from the saved
  config — per-partition limiter instances ARE the engine's
  distributed QPS design (global_qps / num_partitions), so this is
  semantics, not a workaround.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

DEFAULT_USER_AGENT = "wiki-data-pipeline-spark/1.0"


def build_query_url(base_url: str, title: str) -> str:
    """The reference's content-fetch request shape
    (src/mediawiki_client.py:115-123): action=query on the title with
    revision content + categories."""
    params = {
        "action": "query",
        "titles": title,
        "prop": "revisions|categories",
        "rvprop": "content",
        "cllimit": "500",
        "format": "json",
    }
    return f"{base_url}?{urllib.parse.urlencode(params)}"


def parse_article_content(payload: dict) -> str | None:
    """Extract wikitext from a MediaWiki action=query response; None
    for missing pages, empty revision lists, and redirects — the
    reference's not-found conventions (src/mediawiki_client.py:125-150).
    Accepts both the classic ``revisions[0]['*']`` and the modern
    ``revisions[0].slots.main.content`` layouts."""
    pages = payload.get("query", {}).get("pages", {})
    if not pages:
        return None
    page = next(iter(pages.values()))
    if "missing" in page:
        return None
    revisions = page.get("revisions") or []
    if not revisions:
        return None
    rev = revisions[0]
    content = rev.get("*")
    if content is None:
        content = (
            rev.get("slots", {}).get("main", {}).get("content")
            if isinstance(rev.get("slots"), dict)
            else None
        )
    if content is None:
        return None
    if content.startswith(("#REDIRECT", "#redirect")):
        return None
    return content


class FetchError(RuntimeError):
    """The request failed for good (retry budget exhausted)."""


class MediaWikiFetcher:
    """``title -> wikitext`` over HTTP with retry, exponential backoff,
    and adaptive 429 throttling. Instances are callables, so they plug
    straight into ``fetch_enrich(fetcher=MediaWikiFetcher(url))``.

    ``limiter_kwargs`` configure the per-process AdaptiveRateLimiter
    (None disables pacing entirely — e.g. a local fake server in
    tests exercising only the retry path). ``sleep`` is injectable so
    tests pin backoff schedules without wall-clock waits."""

    def __init__(
        self,
        base_url: str,
        user_agent: str = DEFAULT_USER_AGENT,
        timeout: float = 30.0,
        max_retries: int = 3,
        initial_delay: float = 1.0,
        max_delay: float = 60.0,
        limiter_kwargs: dict | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.base_url = base_url
        self.user_agent = user_agent
        self.timeout = timeout
        self.max_retries = max_retries
        self.initial_delay = initial_delay
        self.max_delay = max_delay
        self.limiter_kwargs = limiter_kwargs
        self._sleep = sleep
        self._limiter = None

    # -- pickling: config travels, live state (locks, deques) does not
    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_limiter"] = None
        state["_sleep"] = None  # injected test doubles don't travel
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        if self._sleep is None:
            self._sleep = time.sleep

    @property
    def limiter(self):
        """Lazily-built per-process limiter (None = pacing disabled)."""
        if self._limiter is None and self.limiter_kwargs is not None:
            from wiki_data_pipeline_spark.streaming.rate_limiter import (
                AdaptiveRateLimiter,
            )

            self._limiter = AdaptiveRateLimiter(**self.limiter_kwargs)
        return self._limiter

    def _backoff(self, attempt: int) -> None:
        self._sleep(min(self.initial_delay * (2**attempt), self.max_delay))

    def _get(self, url: str) -> tuple[int, bytes]:
        req = urllib.request.Request(
            url, headers={"User-Agent": self.user_agent}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as exc:
            return exc.code, exc.read()

    def fetch_json(self, url: str) -> dict:
        """GET with the reference's retry discipline: 429 → record +
        backoff + retry; other non-200 → backoff + retry; network
        errors → backoff + retry; budget exhausted → FetchError."""
        last_err = "no attempt made"
        for attempt in range(self.max_retries + 1):
            limiter = self.limiter
            if limiter is not None:
                wait = limiter.should_wait()
                if wait > 0:
                    self._sleep(wait)
                limiter.record_request()
            try:
                status, body = self._get(url)
            except OSError as exc:  # URLError, timeouts, conn refused
                last_err = f"request exception: {exc}"
                if attempt < self.max_retries:
                    self._backoff(attempt)
                continue
            if status == 429:
                if limiter is not None:
                    limiter.record_429()
                last_err = "HTTP 429: rate limited"
                self._backoff(attempt)
                continue
            if status == 200:
                if limiter is not None:
                    limiter.record_success()
                return json.loads(body.decode("utf-8"))
            last_err = f"HTTP {status}"
            if attempt < self.max_retries:
                self._backoff(attempt)
        raise FetchError(
            f"failed after {self.max_retries + 1} attempts: {last_err}"
        )

    def __call__(self, title: str) -> str | None:
        return parse_article_content(
            self.fetch_json(build_query_url(self.base_url, title))
        )
