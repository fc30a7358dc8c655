"""Invariant tests for the experimentation-analytics batch
(plans/statistics.py: cuped_variance_reduction, did_revenue_estimator,
srm_allocation_check)."""

from __future__ import annotations

import pytest

from stacktrend_spark.plans.statistics import (
    cuped_variance_reduction,
    did_revenue_estimator,
    srm_allocation_check,
)
from stacktrend_spark.sources.tables import load_table

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_cuped_reduction_is_a_fraction(spark, sf_dir):
    r = cuped_variance_reduction(spark, sf_dir).collect()[0]
    n_cust_with_orders = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert r["n_units"] == n_cust_with_orders
    # rho^2 is a squared correlation: a true fraction of Var(Y)
    assert 0 <= r["rho2_ppm"] <= 1000000
    assert r["theta_micro"] is not None


def test_did_equals_cell_mean_combination(spark, sf_dir):
    r = did_revenue_estimator(spark, sf_dir).collect()[0]
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert r["n_total"] == n_orders
    recomputed = (r["mean_t_post_c"] - r["mean_t_pre_c"]) - (
        r["mean_c_post_c"] - r["mean_c_pre_c"]
    )
    # the official estimate rounds the UNROUNDED double tree; the
    # recombination of four independently-rounded means can differ by
    # at most the four rounding half-units
    assert abs(r["did_centicents"] - recomputed) <= 2


def test_srm_counts_partition_and_chi2_formula(spark, sf_dir):
    rows = srm_allocation_check(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n"] for r in rows) == n_cust
    for r in rows:
        assert r["n_a"] + r["n_b"] == r["n"]
        d = r["n_a"] - r["n_b"]
        assert r["chi2_micro"] == d * d * 1000000 // r["n"]
        assert r["srm_flag"] == (r["chi2_micro"] > 3841459)


def test_neyman_allocation_conserves_budget(spark, sf_dir):
    from stacktrend_spark.plans.statistics import (
        _NEYMAN_K,
        neyman_allocation_plan,
    )

    rows = neyman_allocation_plan(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(r["alloc_n"] for r in rows) == _NEYMAN_K
    for r in rows:
        assert r["alloc_n"] >= 0
