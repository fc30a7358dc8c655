"""Invariant tests for the ML-governance layer (plans/governance.py).

Oracle value-parity is covered by the sweep; these pin the statistical
contracts — parity ratios bounded by the most-favored group, conformal
coverage concentrating at 1−α, IV contributions non-negative — that a
value-identical-but-wrong oracle pair could not catch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stacktrend_spark.plans.governance import (
    conformal_calibration_quantile,
    fairness_demographic_parity,
    woe_information_value,
)
from stacktrend_spark.sources.tables import load_table

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_parity_ratio_bounded_by_best_group(spark, sf_dir):
    rows = fairness_demographic_parity(spark, sf_dir).collect()
    assert len(rows) == 5  # TPC-H market segments
    assert max(r["parity_ratio_ppm"] for r in rows) == 1000000
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n"]
        assert 0 <= r["parity_ratio_ppm"] <= 1000000
        assert r["four_fifths_ok"] == (r["parity_ratio_ppm"] >= 800000)


def test_conformal_coverage_concentrates_at_level(spark, sf_dir):
    rows = conformal_calibration_quantile(spark, sf_dir).collect()
    assert rows
    assert len({r["qhat_cents"] for r in rows}) == 1  # one global quantile
    n_eval = sum(r["n_eval"] for r in rows)
    n_cov = sum(r["n_covered"] for r in rows)
    # exchangeable splits guarantee coverage >= 1 - alpha in
    # expectation; the temporal split here is near-exchangeable
    # (synthetic data has no drift), so pooled coverage should land
    # close to 90% — the bound is loose enough for sf0.001
    assert 0.80 <= n_cov / n_eval <= 0.98
    for r in rows:
        assert 0 <= r["n_covered"] <= r["n_eval"]


def test_woe_mass_and_iv_sign(spark, sf_dir):
    rows = woe_information_value(spark, sf_dir).collect()
    n_li = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n"] for r in rows) == n_li
    assert {r["bin"] for r in rows} <= set(range(5))
    for r in rows:
        assert r["n_event"] + r["n_nonevent"] == r["n"]
        # (share_e - share_ne) and WoE = ilog(share_e) - ilog(share_ne)
        # always share a sign (xlog10 is monotone), so every IV
        # contribution is non-negative
        assert r["iv_contrib_micro"] >= 0
        if r["share_e_ppm"] > r["share_ne_ppm"]:
            assert r["woe_micro"] >= 0
        elif r["share_e_ppm"] < r["share_ne_ppm"]:
            assert r["woe_micro"] <= 0
