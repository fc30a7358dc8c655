"""Invariant tests for session_window_native_batch (plans/windows.py)
and snippet_best_window (plans/mlprep.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from stacktrend_spark.plans.mlprep import _SNIP_W, snippet_best_window
from stacktrend_spark.plans.windows import _GAP_US, session_window_native_batch
from stacktrend_spark.sources.tables import load_table

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_native_sessions_conserve_events_and_never_overlap(spark, sf_dir):
    rows = session_window_native_batch(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    by_user = defaultdict(list)
    for r in rows:
        # session_window: end = last event + gap, so span >= gap
        assert r["session_end_us"] - r["session_start_us"] >= _GAP_US
        by_user[r["user_id"]].append((r["session_start_us"], r["session_end_us"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            # merge semantics: the next session starts only after the
            # previous one's gap-extended end
            assert s2 >= e1


def test_snippet_windows_hit_bounds(spark, sf_dir):
    rows = snippet_best_window(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert len(rows) <= n_docs
    lens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r["n_hits"] >= 1
        assert r["best_start"] >= 1
        # a window never hits more often than its width
        assert r["n_hits"] <= _SNIP_W
        # the start stays inside the document (clamped contract)
        assert r["best_start"] <= max(lens[r["doc_id"]] - _SNIP_W + 1, 1)
