"""Semantic properties of the linkage/graph/sweep-line operators —
the oracle-parity test proves engine equivalence; these pin the
OPERATOR semantics independently (a shared bug in both the Spark plan
and its oracle would slip the parity gate)."""

from __future__ import annotations

import itertools

import pandas as pd

from stacktrend_spark.plans.curation import corpus_shard_assign
from stacktrend_spark.plans.linkage import (
    _TRI_MIN_QTY,
    er_blocked_name_match,
    max_concurrent_intervals,
    triangle_count_copurchase,
)
from stacktrend_spark.sources.tables import load_table


def test_er_match_tiers_nest_and_cover(spark, sf_dir):
    out = er_blocked_name_match(spark, sf_dir).toPandas()
    parts = load_table(spark, sf_dir, "part").count()
    assert out.n_records.sum() == parts
    # radius-1 matches are a subset of radius-2 matches
    assert (out.n_near1_pairs <= out.n_near2_pairs).all()
    # every block's exact-dup pairs is C(cnt,2)-consistent: bounded by
    # all-pairs within the block
    allp = out.n_records * (out.n_records - 1) // 2
    assert (out.n_exact_pairs <= allp).all()
    assert (out.n_near2_pairs + out.n_exact_pairs <= allp).all()


def test_triangle_counts_match_bruteforce(spark, sf_dir):
    """Degree-oriented enumeration == naive id-ordered enumeration."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(f"l_quantity >= {_TRI_MIN_QTY}")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        edges.update(itertools.combinations(ps, 2))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    naive: dict[int, int] = {}
    seen = set()
    for u, v in edges:
        for w in adj[u] & adj[v]:
            tri = tuple(sorted((u, v, w)))
            if tri not in seen:
                seen.add(tri)
                for node in tri:
                    naive[node] = naive.get(node, 0) + 1
    got = (
        triangle_count_copurchase(spark, sf_dir)
        .toPandas()
        .set_index("part_key")
        .n_triangles.to_dict()
    )
    assert got == naive


def test_sweep_line_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").toPandas()
    out = (
        max_concurrent_intervals(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    # brute-force global peak via sorted delta walk in pandas
    s = (ev.ts.astype("datetime64[us]").astype("int64")).to_numpy()
    e = s + ((ev.value * 60_000_000 + 0.5).apply(int)).to_numpy()
    deltas = sorted(
        [(t, 1, i) for t, i in zip(s, ev.event_id)]
        + [(t, -1, i) for t, i in zip(e, ev.event_id)],
        key=lambda x: (x[0], x[1], x[2]),
    )
    run = peak = 0
    for _, d, _i in deltas:
        run += d
        peak = max(peak, run)
    assert out.loc["__all__", "peak_concurrent"] == peak
    assert out.loc["__all__", "n_intervals"] == len(ev)
    per_type_max = out.drop(index="__all__").peak_concurrent.max()
    assert peak >= per_type_max
    assert out.drop(index="__all__").n_intervals.sum() == len(ev)


def test_shard_assignment_is_uniform_and_complete(spark, sf_dir):
    out = corpus_shard_assign(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").count()
    assert set(out.epoch) == {0, 1, 2}
    assert out.shard.between(0, 15).all()
    per_epoch = out.groupby("epoch").n_docs.sum()
    assert (per_epoch == docs).all()
    # epochs shuffle independently: shard histograms must differ
    # between at least one pair of epochs (salted hash actually salts)
    hist = {
        ep: tuple(g.sort_values("shard").n_docs) for ep, g in out.groupby("epoch")
    }
    assert len(set(hist.values())) > 1
