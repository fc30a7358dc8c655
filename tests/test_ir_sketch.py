"""Invariant tests for query_likelihood_dirichlet (plans/mlprep.py)
and misra_gries_summary (plans/sketches.py)."""

from __future__ import annotations

import pytest

from stacktrend_spark.plans.mlprep import _QL_TOPK, query_likelihood_dirichlet
from stacktrend_spark.plans.sketches import _MG_K, misra_gries_summary

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_ql_scores_are_log_probabilities(spark, sf_dir):
    rows = query_likelihood_dirichlet(spark, sf_dir).collect()
    assert len(rows) == _QL_TOPK
    assert sorted(r["rnk"] for r in rows) == list(range(1, _QL_TOPK + 1))
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["ql_score_micro"] >= b["ql_score_micro"]
    for r in rows:
        # every p(q|d) < 1, so the summed log-likelihood is negative
        assert r["ql_score_micro"] < 0
        assert r["n_tokens"] > 0


def test_misra_gries_summary_guarantees(spark, sf_dir):
    rows = misra_gries_summary(spark, sf_dir).collect()
    assert 0 < len(rows) <= _MG_K
    thetas = {r["theta"] for r in rows}
    assert len(thetas) == 1
    for r in rows:
        assert r["exact_cnt"] > r["theta"]
        assert r["mg_weight"] == r["exact_cnt"] - r["theta"]
        assert r["mg_weight"] >= 1
        # the classic MG undercount bound, audited per row
        assert r["mg_bound_ok"] is True
