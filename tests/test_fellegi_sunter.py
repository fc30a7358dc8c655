"""Invariant tests for fellegi_sunter_weights (plans/linkage.py)."""

from __future__ import annotations

import pytest

from stacktrend_spark.plans.linkage import _FS_PANEL, fellegi_sunter_weights

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_fs_patterns_partition_panel_and_weights_order(spark, sf_dir):
    rows = fellegi_sunter_weights(spark, sf_dir).collect()
    # panel pair count: every pair lands in exactly one pattern
    import math

    n_panel_keys = min(_FS_PANEL, 10**9)  # c_custkey < _FS_PANEL
    total = sum(r["n_pairs"] for r in rows)
    # custkeys are 1..N so the panel holds min(N, _FS_PANEL-1) records;
    # just pin the combinatorial identity against the observed count
    n_rec = int((1 + math.isqrt(1 + 8 * total)) // 2)
    assert n_rec * (n_rec - 1) // 2 == total
    patterns = {(r["agree_nation"], r["agree_segment"], r["agree_balband"]) for r in rows}
    assert len(patterns) == len(rows)  # one row per pattern
    # monotonicity: flipping any field from disagree to agree must
    # INCREASE the weight (log(m/u) > 0 > log((1-m)/(1-u)) for m > u)
    by_pat = {
        (r["agree_nation"], r["agree_segment"], r["agree_balband"]): r[
            "fs_weight_micro"
        ]
        for r in rows
    }
    for (a, b, c), wt in by_pat.items():
        for i, flag in enumerate((a, b, c)):
            if not flag:
                flipped = tuple(
                    True if j == i else v for j, v in enumerate((a, b, c))
                )
                if flipped in by_pat:
                    assert by_pat[flipped] > wt
