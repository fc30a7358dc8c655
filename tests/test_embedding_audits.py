"""Invariant tests for the embedding-audit batch (plans/clustering.py:
matryoshka_truncation_agreement, jl_projection_distortion)."""

from __future__ import annotations

import pytest

from stacktrend_spark.plans.clustering import (
    _JL_N,
    _MRL_KS,
    _MRL_Q,
    jl_projection_distortion,
    matryoshka_truncation_agreement,
)

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_matryoshka_full_prefix_agrees_with_itself(spark, sf_dir):
    rows = {r["k"]: r for r in matryoshka_truncation_agreement(spark, sf_dir).collect()}
    assert set(rows) == set(_MRL_KS)
    for r in rows.values():
        assert r["n_queries"] == _MRL_Q
        assert 0 <= r["n_agree"] <= r["n_queries"]
        assert r["agree_ppm"] == r["n_agree"] * 1000000 // r["n_queries"]
    # the k=64 prefix IS the full vector: perfect agreement by identity
    assert rows[64]["n_agree"] == _MRL_Q
    assert rows[64]["agree_ppm"] == 1000000


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    rows = jl_projection_distortion(spark, sf_dir).collect()
    n_pairs = sum(r["n_pairs"] for r in rows)
    assert n_pairs == _JL_N * (_JL_N - 1) // 2
    for r in rows:
        assert r["min_distortion_ppm"] <= r["mean_distortion_ppm"] <= r["max_distortion_ppm"]
        assert r["bucket"] == r["min_distortion_ppm"] // 200000
    # JL: the pair-weighted mean distortion of a +-1 projection is an
    # unbiased estimator of 1 — the panel mean must land near 1e6
    wmean = sum(r["mean_distortion_ppm"] * r["n_pairs"] for r in rows) / n_pairs
    assert 700000 <= wmean <= 1400000
