"""Structural parity gate: no engine-dependent math on hashed surfaces.

Round 1's driver hash failure was a libm log10 ulp divergence that no
local value-compare could reproduce (it lived in the DRIVER's DuckDB
build). The faithful local gate is structural — ban the constructs
whose bits are engine-dependent. Policy and proofs: PARITY.md.
"""

from __future__ import annotations

from tools.parity_audit import audit_oracle, audit_plan, run_audit


def test_no_engine_dependent_math_on_hashed_surfaces(spark):
    problems = run_audit("/root/testdata/sf0.001")
    assert problems == [], "\n".join(problems)


def test_audit_catches_libm_in_oracle():
    assert audit_oracle("q", "SELECT LOG10(x) FROM t")
    assert audit_oracle("q", "SELECT POWER(x, 2) FROM t")
    assert audit_oracle("q", "SELECT STDDEV_SAMP(x) FROM t")
    # corr( must flag, but a column NAMED corr_x must not
    assert audit_oracle("q", "SELECT CORR(x, y) FROM t")
    assert not audit_oracle("q", "SELECT corr_x FROM t")
    # sqrt / floor / arithmetic are deterministic → allowed
    assert not audit_oracle("q", "SELECT SQRT(x) + FLOOR(y) / 2.0 FROM t")


def test_audit_catches_libm_in_plan():
    assert audit_plan("q", "Project [LOG10(cast(x as double)) AS s]")
    assert not audit_plan("q", "Project [SQRT(cast(x as double)) AS s]")
    # substrings of identifiers must not trip the word boundary
    assert not audit_plan("q", "Project [last_login AS l, dialog AS d]")
