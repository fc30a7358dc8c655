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


def test_kn_discount_mass_identity(spark, sf_dir):
    """For every context w1: sum of discounted quarter-counts over its
    seen continuations equals 4*c(w1.) - 3*N1+(w1.) exactly (c >= 1 so
    the max() never binds), i.e. the freed mass is exactly
    D * N1+(w1.) — the quantity lambda re-distributes."""
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    big = Counter()
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    per_w1 = defaultdict(lambda: [0, 0, 0])  # [sum_disc_quarters, c_w1, n1]
    for (a, _), c in big.items():
        e = per_w1[a]
        e[0] += max(4 * c - 3, 0)
        e[1] += c
        e[2] += 1
    for a, (disc, cw, n1) in per_w1.items():
        assert disc == 4 * cw - 3 * n1, a
