"""Kneser-Ney bigram LM (r9): pins the estimator against an
independent pure-Python reimplementation of Chen & Goodman's
interpolated KN, plus the discount-mass identity — the complement to
the oracle-parity gate (which checks the SQL twin, not the math)."""

from __future__ import annotations

from collections import Counter, defaultdict

from stacktrend_spark.plans.curation import _PPB, kneser_ney_bigram_lm

_D_NUM, _D_DEN = 3, 4  # D = 3/4 in quarter-counts


def _brute_kn(texts: list[str]):
    """(w1, w2) -> (c, term1_ppb, lambda_ppb, pcont_ppb, p_kn_ppb) via
    the literal integer tree the query promises."""
    big = Counter()
    for t in texts:
        ws = t.split(" ")
        if len(ws) < 2:
            continue
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    c_w1, n1_fwd, n1_back = Counter(), Counter(), Counter()
    for (a, b), c in big.items():
        c_w1[a] += c
        n1_fwd[a] += 1
        n1_back[b] += 1
    n_types = len(big)
    out = {}
    for (a, b), c in big.items():
        term1 = max(4 * c - 3, 0) * _PPB // (4 * c_w1[a])
        lam = (3 * n1_fwd[a] * _PPB) // (4 * c_w1[a])
        pcont = (n1_back[b] * _PPB) // n_types
        out[(a, b)] = (c, term1, lam, pcont, term1 + (lam * pcont) // _PPB)
    return out


def test_kn_matches_bruteforce(spark, sf_dir):
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    expect = _brute_kn(texts)
    rows = kneser_ney_bigram_lm(spark, sf_dir).collect()
    assert len(rows) == 100
    # the query returns the top-100 by (count desc, w1, w2); check the
    # membership boundary and every value against the reimplementation
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))[:100]
    assert [(r["w1"], r["w2"]) for r in rows] == [k for k, _ in ranked]
    for r in rows:
        c, t1, lam, pc, p = expect[(r["w1"], r["w2"])]
        assert r["bigram_count"] == c
        assert r["term1_ppb"] == t1
        assert r["lambda_ppb"] == lam
        assert r["pcont_ppb"] == pc
        assert r["p_kn_ppb"] == p


def test_kn_plan_output_probability_contract(spark, sf_dir):
    """Properties of the PLAN's own output rows: lambda is a function
    of the context alone (constant within each w1), every component
    and the interpolated probability are valid floor-ppb probabilities,
    and the interpolation is assembled from the emitted components by
    the promised integer tree."""
    rows = kneser_ney_bigram_lm(spark, sf_dir).collect()
    assert rows
    lam_by_w1 = defaultdict(set)
    for r in rows:
        lam_by_w1[r["w1"]].add(r["lambda_ppb"])
        assert 0 <= r["term1_ppb"] <= _PPB
        assert 0 < r["lambda_ppb"] < _PPB  # D>0 and N1+ >= 1 force both
        assert 0 < r["pcont_ppb"] <= _PPB
        assert 0 < r["p_kn_ppb"] <= _PPB  # a floor-ppb probability
        assert r["p_kn_ppb"] == r["term1_ppb"] + (
            r["lambda_ppb"] * r["pcont_ppb"]
        ) // _PPB
    assert all(len(v) == 1 for v in lam_by_w1.values())
