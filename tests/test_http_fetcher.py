"""The concrete HTTP MediaWiki fetcher (sources/http_fetcher.py)
against a stdlib ``http.server`` fake serving canned MediaWiki JSON —
hermetic (loopback only, no network): retry-on-429 feeding the
adaptive limiter, backoff schedule, not-found/redirect conventions,
and the end-to-end Spark path through fetch_enrich's dead-letter
machinery (reference src/mediawiki_client.py:22-64,113-171;
src/enhanced_production_mediawiki_client.py:146-186)."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from wiki_data_pipeline_spark.sources.http_fetcher import (
    FetchError,
    MediaWikiFetcher,
    build_query_url,
    parse_article_content,
)


def _page_json(title: str, content: str) -> dict:
    return {
        "query": {
            "pages": {
                "42": {
                    "pageid": 42,
                    "title": title,
                    "revisions": [{"*": content}],
                    "categories": [{"title": "Category:Testing"}],
                }
            }
        }
    }


_MISSING = {"query": {"pages": {"-1": {"title": "Nope", "missing": ""}}}}


class _FakeMediaWiki(BaseHTTPRequestHandler):
    """Canned MediaWiki: per-title scripted responses. The server
    object carries the script + a request log; tests assert on both."""

    def do_GET(self):  # noqa: N802 (stdlib naming)
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        title = q.get("titles", [""])[0]
        self.server.log.append(
            {"title": title, "ua": self.headers.get("User-Agent")}
        )
        script = self.server.scripts.get(title, [])
        idx = self.server.counts.get(title, 0)
        self.server.counts[title] = idx + 1
        status, payload = (
            script[min(idx, len(script) - 1)]
            if script
            else (200, _page_json(title, f"wikitext of {title}"))
        )
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence stderr
        pass


@pytest.fixture()
def fake_wiki():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeMediaWiki)
    srv.scripts = {}
    srv.counts = {}
    srv.log = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}/w/api.php"
    finally:
        srv.shutdown()
        srv.server_close()


def test_fetch_happy_path_and_request_shape(fake_wiki):
    srv, url = fake_wiki
    fetcher = MediaWikiFetcher(url, initial_delay=0.0)
    assert fetcher("Albert Einstein") == "wikitext of Albert Einstein"
    assert srv.log[0]["title"] == "Albert Einstein"
    assert srv.log[0]["ua"] == "wiki-data-pipeline-spark/1.0"
    # the reference's query params all present (mediawiki_client:115-123)
    q = urllib.parse.parse_qs(
        urllib.parse.urlparse(build_query_url(url, "X")).query
    )
    assert q["action"] == ["query"] and q["prop"] == ["revisions|categories"]
    assert q["rvprop"] == ["content"] and q["format"] == ["json"]


def test_missing_and_redirect_return_none(fake_wiki):
    srv, url = fake_wiki
    srv.scripts["Gone"] = [(200, _MISSING)]
    srv.scripts["Redir"] = [(200, _page_json("Redir", "#REDIRECT [[X]]"))]
    srv.scripts["Empty"] = [(200, {"query": {"pages": {}}})]
    fetcher = MediaWikiFetcher(url, initial_delay=0.0)
    assert fetcher("Gone") is None
    assert fetcher("Redir") is None
    assert fetcher("Empty") is None
    # modern slots layout also parses
    slots = {
        "query": {"pages": {"7": {"title": "S", "revisions": [
            {"slots": {"main": {"content": "slot text"}}}]}}}
    }
    assert parse_article_content(slots) == "slot text"


def test_retry_on_429_feeds_adaptive_limiter(fake_wiki):
    """Three consecutive 429s must (a) be retried with the reference's
    min(initial·2^attempt, max) backoff schedule, (b) drive the
    adaptive limiter's ×0.8 throttle, and (c) still succeed on the
    eventual 200 — end-to-end through one fetch call."""
    srv, url = fake_wiki
    srv.scripts["Hot"] = [(429, {}), (429, {}), (429, {}),
                          (200, _page_json("Hot", "finally"))]
    sleeps: list[float] = []
    fetcher = MediaWikiFetcher(
        url,
        max_retries=3,
        initial_delay=0.01,
        max_delay=60.0,
        limiter_kwargs={"qps_limit": 100.0, "burst_limit": 1000},
        sleep=sleeps.append,
    )
    assert fetcher("Hot") == "finally"
    assert srv.counts["Hot"] == 4
    # backoff schedule: 0.01, 0.02, 0.04 (limiter waits are 0 here)
    assert [s for s in sleeps if s > 0] == [0.01, 0.02, 0.04]
    # 3 consecutive 429s -> current_qps dropped by the backoff factor
    assert fetcher.limiter.stats["current_qps"] == pytest.approx(80.0)


def test_budget_exhaustion_raises_fetch_error(fake_wiki):
    srv, url = fake_wiki
    srv.scripts["Down"] = [(503, {})]
    fetcher = MediaWikiFetcher(
        url, max_retries=2, initial_delay=0.0, sleep=lambda s: None
    )
    with pytest.raises(FetchError, match="HTTP 503"):
        fetcher("Down")
    assert srv.counts["Down"] == 3  # initial + 2 retries

    # connection refused (server port with no listener) also exhausts
    dead = MediaWikiFetcher(
        "http://127.0.0.1:1/w/api.php",
        max_retries=1,
        initial_delay=0.0,
        timeout=0.5,
        sleep=lambda s: None,
    )
    with pytest.raises(FetchError, match="request exception"):
        dead("Anything")


def test_fetch_enrich_end_to_end_over_http(spark, fake_wiki):
    """The full Spark path: MediaWikiFetcher cloudpickled into
    fetch_enrich's mapInPandas closure, fetching from the local fake
    over real HTTP — successes enriched, a missing page dead-lettered
    with the LookupError convention, a transient 429 retried by the
    CLIENT level (invisible to the enrichment wrapper: attempts == 1)."""
    from wiki_data_pipeline_spark.operators.enrichment import fetch_enrich

    srv, url = fake_wiki
    srv.scripts["Flaky"] = [(429, {}), (200, _page_json("Flaky", "ok now"))]
    srv.scripts["Gone"] = [(200, _MISSING)]
    stubs = spark.createDataFrame(
        [(1, "Solid"), (2, "Flaky"), (3, "Gone")], "doc_id long, title string"
    ).coalesce(1)
    fetcher = MediaWikiFetcher(url, initial_delay=0.0, max_retries=3)
    out = {
        r.doc_id: r
        for r in fetch_enrich(
            stubs, fetcher=fetcher, source_name="fake_mediawiki",
            max_retries=1, initial_delay=0.0,
        ).collect()
    }
    assert out[1].content == "wikitext of Solid"
    assert out[1].source == "fake_mediawiki" and out[1].attempts == 1
    assert out[2].content == "ok now" and out[2].attempts == 1
    assert out[3].content is None and out[3].source is None
    assert "returned None" in out[3].error  # dead-lettered, not raised
