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


def test_ndcg_bounds_and_ideal_dominance(spark, sf_dir):
    from stacktrend_spark.plans.mlprep import retrieval_ndcg_eval

    rows = retrieval_ndcg_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_ranked"] <= 10
        # ideal ordering dominates the retrieved ordering
        assert r["idcg_r6"] >= r["dcg_r6"] > 0
        assert 0 < r["ndcg_ppm"] <= 1000000
        assert r["mrr_ppm"] == 0 or 100000 <= r["mrr_ppm"] <= 1000000


def test_observed_metrics_match_direct_aggregate(spark, sf_dir):
    from pyspark.sql import functions as F

    from stacktrend_spark.plans.formats import observed_metrics_noop_sink
    from stacktrend_spark.sources.tables import load_table

    got = observed_metrics_noop_sink(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    want = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    ).collect()[0]
    assert got["n_rows"] == want["n"]
    assert got["sum_qty"] == want["q"]
