"""Invariant tests for the omnibus statistics batch
(plans/statistics.py: anova_oneway_f, kruskal_wallis_h)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stacktrend_spark.plans.statistics import anova_oneway_f, kruskal_wallis_h
from stacktrend_spark.sources.tables import load_table

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_anova_variance_decomposition(spark, sf_dir):
    r = anova_oneway_f(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "orders").count()
    assert r["n_total"] == n
    assert r["k_groups"] == 5
    assert r["ssb_units2"] >= 0 and r["ssw_units2"] >= 0
    assert 0 <= r["eta2_ppm"] <= 1000000
    assert r["f_micro"] >= 0
    # decomposition: SSB + SSW equals the total sum of squares up to
    # the documented < k_groups truncation of the s_g^2/n_g terms
    vals = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long").alias("x")
    )
    t = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.expr("CAST(CAST(x AS DECIMAL(38,0)) * x AS DECIMAL(38,0))")).alias(
            "s2"
        ),
    ).collect()[0]
    sst = int(t["s2"]) - int(t["s1"]) * int(t["s1"]) // int(t["n"])
    assert abs((r["ssb_units2"] + r["ssw_units2"]) - sst) <= r["k_groups"]


def test_kruskal_wallis_rank_conservation_and_bounds(spark, sf_dir):
    r = kruskal_wallis_h(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "orders").count()
    assert r["n_total"] == n
    assert r["rank_sum_ok"] is True  # distributed ranks are a permutation
    # 0 <= H <= N-1 (exact for tie-free ranks), micro-scaled with a
    # small truncation allowance
    assert -1000 <= r["h_micro"] <= (n - 1) * 1000000
