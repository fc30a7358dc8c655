"""Fault-injection tests for the executor-side LLM/REST adapters.

Exercises the retry/backoff/fallback/batch semantics of
``classify_records`` (pipelines/classifier.py) and the pagination /
rate-cap behavior of the REST layer (sources/rest.py) under injected
failures — 403s, timeouts, malformed JSON — without a live endpoint.
Contract mirrored from the reference: 3 attempts, exponential backoff
min(4·2^attempt, 10) (llm_classifier.py:150-153), batch size 10
(llm:56), failed chunks default to Other/unknown/0.1; the urllib
transport itself is driven against a monkeypatched urlopen.
"""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.request

import pytest

from stacktrend_spark.pipelines.classifier import (
    classify_records,
    urllib_post,
)
from stacktrend_spark.sources.rest import RateLimiter, fetch_paginated


def _records(n: int) -> list[dict]:
    return [
        {"repository_id": i, "name": f"repo{i}", "description": "d"}
        for i in range(n)
    ]


def _ok_response(body: bytes) -> bytes:
    """Echo transport: classify every repo in the request as AI/llm_tools."""
    repos = json.loads(body)["repositories"]
    return json.dumps(
        {
            "classifications": [
                {
                    "repository_id": r["repository_id"],
                    "technology_category": "AI",
                    "technology_subcategory": "llm_tools",
                    "classification_confidence": 0.9,
                }
                for r in repos
            ]
        }
    ).encode()


# ---------------------------------------------------------------------------
# classify_records: batching
# ---------------------------------------------------------------------------


def test_batches_of_ten():
    calls = []

    def post(body: bytes) -> bytes:
        calls.append(json.loads(body)["repositories"])
        return _ok_response(body)

    out = classify_records(_records(23), post, sleeper=lambda s: None)
    assert [len(c) for c in calls] == [10, 10, 3]
    assert len(out) == 23
    assert all(r["technology_category"] == "AI" for r in out)


# ---------------------------------------------------------------------------
# classify_records: retry / backoff / fallback
# ---------------------------------------------------------------------------


def test_http_403_retries_then_falls_back():
    attempts, sleeps = [], []

    def post(body: bytes) -> bytes:
        attempts.append(1)
        raise urllib.error.HTTPError("http://x", 403, "Forbidden", {}, None)

    out = classify_records(_records(3), post, sleeper=sleeps.append)
    assert len(attempts) == 3  # stop_after_attempt(3)
    assert sleeps == [4, 8]  # wait_exponential(multiplier=1, min=4, max=10)
    assert len(out) == 3
    assert all(r["technology_category"] == "Other" for r in out)
    assert all(r["classification_confidence"] == 0.1 for r in out)


def test_timeout_then_success_recovers():
    state = {"n": 0}
    sleeps = []

    def post(body: bytes) -> bytes:
        state["n"] += 1
        if state["n"] == 1:
            raise TimeoutError("timed out")
        return _ok_response(body)

    out = classify_records(_records(2), post, sleeper=sleeps.append)
    assert state["n"] == 2
    assert sleeps == [4]  # one backoff, then success — no fallback rows
    assert all(r["technology_category"] == "AI" for r in out)


def test_malformed_json_counts_as_failed_attempt():
    attempts = []

    def post(body: bytes) -> bytes:
        attempts.append(1)
        return b"<html>502 Bad Gateway</html>"

    out = classify_records(_records(1), post, sleeper=lambda s: None)
    assert len(attempts) == 3
    assert out == [
        {
            "repository_id": 0,
            "technology_category": "Other",
            "technology_subcategory": "unknown",
            "classification_confidence": 0.1,
        }
    ]


def test_missing_key_counts_as_failed_attempt():
    def post(body: bytes) -> bytes:
        return json.dumps({"unexpected": []}).encode()

    out = classify_records(_records(1), post, sleeper=lambda s: None)
    assert out[0]["technology_category"] == "Other"


def test_per_chunk_isolation():
    """A failing chunk falls back without poisoning later chunks."""
    calls = {"n": 0}

    def post(body: bytes) -> bytes:
        calls["n"] += 1
        repos = json.loads(body)["repositories"]
        if repos[0]["repository_id"] == 0:  # first chunk always fails
            raise ConnectionResetError("boom")
        return _ok_response(body)

    out = classify_records(_records(15), post, sleeper=lambda s: None)
    # chunk 1 (ids 0-9): 3 failed attempts; chunk 2 (ids 10-14): 1 ok
    assert calls["n"] == 4
    cats = {r["repository_id"]: r["technology_category"] for r in out}
    assert all(cats[i] == "Other" for i in range(10))
    assert all(cats[i] == "AI" for i in range(10, 15))


# ---------------------------------------------------------------------------
# the urllib transport itself (monkeypatched urlopen — no network)
# ---------------------------------------------------------------------------


def test_urllib_post_request_shape(monkeypatch):
    seen = {}

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["api-key"] = req.get_header("Api-key")
        seen["content-type"] = req.get_header("Content-type")
        seen["body"] = req.data
        seen["timeout"] = timeout
        return io.BytesIO(_ok_response(req.data))

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    post = urllib_post("http://endpoint/classify", "sekrit", timeout=17.0)
    out = classify_records(_records(2), post, sleeper=lambda s: None)
    assert seen["url"] == "http://endpoint/classify"
    assert seen["api-key"] == "sekrit"
    assert seen["content-type"] == "application/json"
    assert json.loads(seen["body"])["repositories"][0]["repository_id"] == 0
    assert seen["timeout"] == 17.0
    assert all(r["technology_category"] == "AI" for r in out)


def test_urllib_post_http_error_surfaces(monkeypatch):
    def fake_urlopen(req, timeout=None):
        raise urllib.error.HTTPError(req.full_url, 403, "Forbidden", {}, None)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    post = urllib_post("http://endpoint/classify", "k")
    with pytest.raises(urllib.error.HTTPError):
        post(b"{}")
    # and through the kernel it degrades to fallback rows, not a crash
    out = classify_records(_records(1), post, sleeper=lambda s: None)
    assert out[0]["technology_category"] == "Other"


# ---------------------------------------------------------------------------
# REST pagination under faults
# ---------------------------------------------------------------------------


def test_fetch_paginated_surfaces_transport_error():
    """Pagination does not swallow transport failures — ingestion jobs
    must fail loudly (the retry policy lives in the transport layer,
    mirroring the reference where tenacity wraps the client call)."""

    def transport(path, params):
        if params["page"] == 2:
            raise urllib.error.HTTPError(path, 403, "rate limited", {}, None)
        return [{"id": i} for i in range(params["per_page"])]

    with pytest.raises(urllib.error.HTTPError):
        fetch_paginated(transport, "/search", {}, max_pages=5, per_page=3)


def test_fetch_paginated_rate_cap_pacing():
    """The 80 req/min self-cap paces every page request (settings.py:43-44)."""
    sleeps = []
    clock = {"t": 0.0}

    def fake_clock():
        return clock["t"]

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    limiter = RateLimiter(per_minute=60, sleeper=fake_sleep, clock=fake_clock)

    def transport(path, params):
        return [{"id": params["page"]}] if params["page"] <= 3 else []

    out = fetch_paginated(
        transport, "/x", {}, max_pages=10, per_page=1, limiter=limiter
    )
    assert len(out) == 3
    # first request free, every subsequent one paced to 1s intervals
    assert len(sleeps) >= 2
    assert all(abs(s - 1.0) < 1e-9 for s in sleeps)
