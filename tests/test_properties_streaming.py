"""Property-based tests for the streaming family (r12, extending the
r10-r12 property campaign to §2.10 — the engine's native-beyond-
reference surface).

The registered streaming mirrors execute REAL Structured Streaming
(readStream → watermark → stateful op → availableNow → memory sink);
they are driver-proven against DuckDB on the fixed events table. This
suite drives the same registered plans over hypothesis-random event
streams written to tmp parquet and compares against independent
Python models of the streaming semantics, with the boundary cases the
fixed corpus rarely hits:

- events EXACTLY on a day boundary (tumbling window is [start, end) —
  midnight belongs to the new day);
- events EXACTLY one session gap apart (Spark merges them: windows
  are [ts, ts+gap) and adjacent windows touch — the knife edge on
  which this campaign caught the registered oracle's >= split
  disagreeing with Spark, fixed r12);
- interval-join endpoints exactly at p.ts and p.ts - lookback (both
  inclusive);
- duplicate timestamps per user, multi-day spreads, exact re-delivery
  (the doubled dedup stream).

Each example runs a real streaming query start-to-finish; max_examples
stays small.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from stacktrend_spark.plans.registry import all_queries

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DAY_US = 86_400_000_000
_GAP_US = 30 * 60 * 1_000_000
_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC

_EVENTS_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)

# offsets mix uniform draws with exact boundary landmarks (midnights,
# session-gap multiples) so windows/sessions split on the knife edge
_off = st.one_of(
    st.integers(0, 3 * _DAY_US - 1),
    st.sampled_from(
        [0, _DAY_US - 1, _DAY_US, 2 * _DAY_US, _GAP_US, 2 * _GAP_US]
    ),
    st.integers(0, 100).map(lambda k: k * _GAP_US),
)
_etype = st.sampled_from(["purchase", "view"])
_cents = st.integers(-500, 500)


@st.composite
def _streams(draw):
    n = draw(st.integers(1, 25))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # unique event identity
                _BASE_US + draw(_off),
                draw(st.integers(0, 4)),
                draw(_etype),
                draw(_cents) / 100.0,
            )
        )
    return rows


def _events_dir(rows) -> str:
    d = tempfile.mkdtemp(prefix="streamprop_")
    pq.write_table(
        pa.table(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [r[4] for r in rows],
                "props": ["{}"] * len(rows),
            },
            schema=_EVENTS_SCHEMA,
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


def _run(spark, name: str, d: str):
    try:
        return all_queries()[name].fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cents_of(v: float) -> int:
    return int(math.floor(v * 100.0 + 0.5))


@_SETTINGS
@given(rows=_streams())
def test_stream_tumbling_daily_model(spark, rows):
    got = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in _run(spark, "stream_tumbling_daily", _events_dir(rows))
    }
    want: dict[tuple[int, str], list] = {}
    for _, ts, _, et, v in rows:
        key = (ts // _DAY_US * _DAY_US, et)
        agg = want.setdefault(key, [0, 0])
        agg[0] += 1
        agg[1] += _cents_of(v)
    assert got == {k: (n, c / 100.0) for k, (n, c) in want.items()}


@_SETTINGS
@given(rows=_streams())
def test_stream_sliding_2d_model(spark, rows):
    got = {
        (r["window_start_us"], r["user_id"]): r["n_events"]
        for r in _run(spark, "stream_sliding_2d", _events_dir(rows))
    }
    want: Counter = Counter()
    for _, ts, uid, _, _ in rows:
        day = ts // _DAY_US * _DAY_US
        for k in (0, 1):
            want[(day - k * _DAY_US, uid)] += 1
    assert got == dict(want)


@_SETTINGS
@given(rows=_streams())
def test_stream_session_windows_model(spark, rows):
    got = Counter(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in _run(spark, "stream_session_windows", _events_dir(rows))
    )
    by_user: dict[int, list[int]] = {}
    for _, ts, uid, _, _ in rows:
        by_user.setdefault(uid, []).append(ts)
    want: Counter = Counter()
    for uid, tss in by_user.items():
        tss.sort()
        start, n, prev = tss[0], 0, None
        for ts in tss:
            # STRICT >: an event exactly gap after the previous merges
            # (adjacent [ts, ts+gap) windows touch) — Spark semantics
            if prev is not None and ts - prev > _GAP_US:
                want[(uid, start, n)] += 1
                start, n = ts, 0
            n += 1
            prev = ts
        want[(uid, start, n)] += 1
    assert got == want


@_SETTINGS
@given(rows=_streams())
def test_stream_stateful_totals_model(spark, rows):
    got = {
        r["user_id"]: (r["n_events"], r["sum_value_cents"])
        for r in _run(spark, "stream_stateful_totals", _events_dir(rows))
    }
    want: dict[int, list] = {}
    for _, _, uid, _, v in rows:
        agg = want.setdefault(uid, [0, 0])
        agg[0] += 1
        agg[1] += _cents_of(v)
    assert got == {u: tuple(a) for u, a in want.items()}


@_SETTINGS
@given(rows=_streams())
def test_stream_dedup_events_model(spark, rows):
    """The self-unioned (every event delivered twice) stream must come
    out exactly once per event identity, rows byte-identical."""
    got = Counter(
        (r["event_id"], r["ts_us"], r["user_id"], r["event_type"], r["value"])
        for r in _run(spark, "stream_dedup_events", _events_dir(rows))
    )
    want = Counter((i, ts, u, et, v) for i, ts, u, et, v in rows)
    assert got == want


@_SETTINGS
@given(rows=_streams())
def test_stream_stream_attribution_model(spark, rows):
    """Watermarked stream-stream interval join == the quadratic model:
    every (purchase, view) pair of the same user with
    p.ts - 1 day <= v.ts <= p.ts, both endpoints inclusive."""
    got = Counter(
        (r["purchase_id"], r["view_id"], r["user_id"], r["gap_us"])
        for r in _run(spark, "stream_stream_attribution", _events_dir(rows))
    )
    want: Counter = Counter()
    for pid, pts, pu, pet, _ in rows:
        if pet != "purchase":
            continue
        for vid, vts, vu, vet, _ in rows:
            if vet == "view" and vu == pu and pts - _DAY_US <= vts <= pts:
                want[(pid, vid, pu, pts - vts)] += 1
    assert got == want
