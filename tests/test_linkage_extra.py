"""Brute-force cross-checks for the banded interval-overlap join and
the two-pass heavy hitters (complement to the oracle-parity gate —
these validate the OPERATOR semantics, not engine equivalence)."""

from __future__ import annotations

from collections import Counter

from stacktrend_spark.plans.curation import _HH_RATE_INV, heavy_hitters_twopass
from stacktrend_spark.plans.linkage import interval_overlap_join
from stacktrend_spark.sources.tables import load_table


def test_interval_overlap_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").toPandas()
    s = ev.ts.astype("datetime64[us]").astype("int64")
    e = s + (ev.value * 60_000_000 + 0.5).apply(int)
    iv = list(zip(ev.event_id, ev.user_id, ev.event_type, s, e))
    expect = set()
    by_user: dict[int, list] = {}
    for row in iv:
        by_user.setdefault(row[1], []).append(row)
    for rows in by_user.values():
        ps = [r for r in rows if r[2] == "purchase"]
        vs = [r for r in rows if r[2] == "view"]
        for p in ps:
            for v in vs:
                if p[3] < v[4] and v[3] < p[4]:
                    expect.add((p[0], v[0], min(p[4], v[4]) - max(p[3], v[3])))
    got = {
        (r.purchase_id, r.view_id, r.overlap_us)
        for r in interval_overlap_join(spark, sf_dir).collect()
    }
    assert got == expect


def test_heavy_hitters_counts_are_exact_and_thresholded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").toPandas()
    true_counts: Counter = Counter()
    total = 0
    for t in docs.text:
        w = t.split(" ")
        for i in range(len(w) - 1):
            true_counts[f"{w[i]} {w[i+1]}"] += 1
            total += 1
    got = {
        r.bigram: r.n_occurrences
        for r in heavy_hitters_twopass(spark, sf_dir).collect()
    }
    for bigram, n in got.items():
        # reported counts are EXACT (second pass), not sample estimates
        assert n == true_counts[bigram]
        assert n * _HH_RATE_INV >= total
    # the only way a globally-heavy bigram may be absent is a sample
    # miss: its deterministic-sample count fell below the nomination
    # threshold. Verify that is literally the reason for every miss.
    from stacktrend_spark.plans.curation import _HH_SAMPLE_MOD

    sample_counts: Counter = Counter()
    for doc_id, t in zip(docs.doc_id, docs.text):
        if doc_id % _HH_SAMPLE_MOD == 0:
            w = t.split(" ")
            for i in range(len(w) - 1):
                sample_counts[f"{w[i]} {w[i+1]}"] += 1
    for bigram, n in true_counts.items():
        if n * _HH_RATE_INV >= total and bigram not in got:
            nominated = (
                sample_counts[bigram] * _HH_SAMPLE_MOD * _HH_RATE_INV * 2 >= total
            )
            assert not nominated, f"{bigram} nominated but missing from result"
