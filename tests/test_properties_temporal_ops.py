"""Property-based tests for the temporal join operators (r12) —
asof_join / range_join_banded / nearest_join vs brute-force models on
random inputs with planted knife edges.

These operators back the r13-window rows (asof_purchase_login,
asof_nearest_click, range_join_halfday_windows, interval family).
Their driver oracles agree on the fixed testdata, but the fixed data
never exercises the documented edges, which is exactly where a
both-sides-agree defect would hide (the r12 campaign found two such
bugs elsewhere). Planted here:

- right-side TIES in the as-of join (two right rows sharing
  (key, ts) — the operator promises the max payload STRUCT wins,
  carried atomically);
- a right row exactly simultaneous with a left row (backward-
  INCLUSIVE: it must match);
- interval endpoints exactly at the point (start inclusive, end
  exclusive-or-inclusive per flag), zero-length and INVERTED
  (end < start) intervals, and intervals spanning 3+ bands (the r9
  middle-band fix);
- equidistant before/after candidates in the nearest join (tie →
  lower right id) and candidates exactly AT the tolerance
  (inclusive).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from stacktrend_spark.operators.temporal import (
    asof_join,
    nearest_join,
    range_join_banded,
)

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small domains → ties, simultaneity and shared keys happen constantly
_ts = st.integers(0, 40)
_key = st.integers(0, 2)
_pay = st.one_of(st.none(), st.integers(0, 5))


def _skey(vals: tuple) -> tuple:
    """Spark ascending NULLS FIRST total order for a payload tuple."""
    return tuple((v is not None, v if v is not None else 0) for v in vals)


@st.composite
def _asof_case(draw):
    left = [
        (i, draw(_key), draw(_ts))
        for i in range(draw(st.integers(1, 8)))
    ]
    right = [
        (draw(_key), draw(_ts), draw(_pay), draw(_pay))
        for _ in range(draw(st.integers(0, 8)))
    ]
    # planted: a right-side tie AND an exactly-simultaneous right row
    if left:
        lid, k, t = left[0]
        right += [(k, t, 1, 2), (k, t, 3, None)]
    return left, right


@_SETTINGS
@given(case=_asof_case())
def test_asof_join_model(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    right = spark.createDataFrame(
        right_rows, "k long, ts long, rid long, tag long"
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload=["rid", "tag"],
    )
    got = {
        r["lid"]: (r["asof_rid"], r["asof_tag"], r["asof_ts"])
        for r in out.collect()
    }
    want = {}
    for lid, k, t in left_rows:
        cands = [rr for rr in right_rows if rr[0] == k and rr[1] <= t]
        if not cands:
            want[lid] = (None, None, None)
            continue
        best_ts = max(rr[1] for rr in cands)
        tied = [rr for rr in cands if rr[1] == best_ts]
        win = max(tied, key=lambda rr: _skey((rr[2], rr[3])))
        want[lid] = (win[2], win[3], best_ts)
    assert got == want


@st.composite
def _range_case(draw):
    points = [
        (i, draw(st.integers(0, 60)))
        for i in range(draw(st.integers(1, 8)))
    ]
    intervals = [
        (100 + j, draw(st.integers(0, 60)), draw(st.integers(0, 60)))
        for j in range(draw(st.integers(0, 6)))
    ]
    if points:
        pid, pt = points[0]
        # planted: endpoints exactly at the point, zero-length at the
        # point, an inverted interval, and a 3+-band span around it
        intervals += [
            (900, pt, pt + 5),       # starts exactly at pt
            (901, pt - 5, pt),       # ends exactly at pt
            (902, pt, pt),           # zero-length at pt
            (903, pt + 3, pt - 3),   # inverted
            (904, max(0, pt - 25), pt + 25),  # spans 3+ ten-wide bands
        ]
    return points, intervals


@_SETTINGS
@given(case=_range_case(), inclusive=st.booleans())
def test_range_join_banded_model(spark, case, inclusive):
    points_rows, interval_rows = case
    points = spark.createDataFrame(points_rows, "pid long, pt long")
    intervals = spark.createDataFrame(interval_rows, "iid long, s long, e long")
    out = range_join_banded(
        points,
        intervals,
        point_ts="pt",
        start_ts="s",
        end_ts="e",
        band=F.expr("s div 10"),
        point_band=F.expr("pt div 10"),
        end_exclusive=not inclusive,
        end_band=F.expr("e div 10"),
        band_step=F.lit(1),
    )
    got = Counter((r["pid"], r["iid"]) for r in out.collect())
    want: Counter = Counter()
    for pid, pt in points_rows:
        for iid, s, e in interval_rows:
            hit = s <= pt and (pt <= e if inclusive else pt < e)
            if hit:
                want[(pid, iid)] += 1
    assert got == want


@st.composite
def _nearest_case(draw):
    left = [
        (i, draw(_key), draw(st.integers(0, 100)))
        for i in range(draw(st.integers(1, 6)))
    ]
    right = [
        (200 + j, draw(_key), draw(st.integers(0, 100)))
        for j in range(draw(st.integers(0, 8)))
    ]
    if left:
        _, k, t = left[0]
        d = draw(st.integers(0, 10))
        # planted: equidistant before/after (tie → lower rid) and a
        # candidate exactly AT the tolerance boundary
        right += [(300, k, t - d), (301, k, t + d), (302, k, t + 10)]
    return left, right


@_SETTINGS
@given(case=_nearest_case())
def test_nearest_join_model(spark, case):
    left_rows, right_rows = case
    tol = 10
    left = spark.createDataFrame(left_rows, "lid long, k long, lus long")
    right = spark.createDataFrame(right_rows, "rid long, k long, rus long")
    out = nearest_join(
        left, right, key="k", left_us="lus", right_us="rus",
        tolerance_us=tol, left_id="lid", right_id="rid",
    )
    got = {r["lid"]: (r["rid"], r["rus"]) for r in out.collect()}
    want = {}
    for lid, k, lus in left_rows:
        cands = [
            (abs(lus - rus), rid, rus)
            for rid, rk, rus in right_rows
            if rk == k and abs(lus - rus) <= tol
        ]
        if cands:
            _, rid, rus = min(cands)
            want[lid] = (rid, rus)
    assert got == want
