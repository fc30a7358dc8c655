"""As-of and banded range join operator edge cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from stacktrend_spark.operators.temporal import asof_join, range_join_banded


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T12:00:00"), "p2"),
            (2, _ts("2024-01-01T09:00:00"), "p3"),  # no prior right row
        ],
        "k int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),  # simultaneous → matches p1
            (1, _ts("2024-01-01T11:00:00"), 200),
            (2, _ts("2024-01-01T09:30:00"), 300),  # after p3 → no match
        ],
        "k int, ts timestamp, v int",
    )
    out = {
        r.name: (r.asof_v, r.asof_ts)
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts", right_payload=["v"]
        ).collect()
    }
    assert out["p1"] == (100, _ts("2024-01-01T10:00:00"))  # inclusive tie
    assert out["p2"] == (200, _ts("2024-01-01T11:00:00"))  # most recent wins
    assert out["p3"] == (None, None)  # nothing at-or-before


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T06:00:00")),  # == start → in (inclusive)
            (2, _ts("2024-01-01T17:59:59")),  # inside
            (3, _ts("2024-01-01T18:00:00")),  # == end → out (exclusive)
            (4, _ts("2024-01-01T03:00:00")),  # before window
        ],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01T06:00:00"), _ts("2024-01-01T18:00:00"))],
        "iid int, w_start timestamp, w_end timestamp",
    )
    out = range_join_banded(
        points,
        intervals,
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        band=F.date_trunc("day", F.col("w_start")),
        point_band=F.date_trunc("day", F.col("ts")),
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2]


def test_range_join_inverted_interval_drops_not_crashes(spark):
    """An interval with end before start (a routine feed glitch) must
    contribute no matches — NOT abort the job via sequence()'s
    illegal-boundaries error (r9 review finding)."""
    points = spark.createDataFrame(
        [(1, _ts("2024-01-02T12:00:00"))], "pid int, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            # healthy 3-band interval: matches
            (10, _ts("2024-01-01T00:00:00"), _ts("2024-01-03T23:00:00")),
            # inverted: end 4 days BEFORE start — must silently drop
            (11, _ts("2024-01-05T00:00:00"), _ts("2024-01-01T00:00:00")),
        ],
        "iid int, w_start timestamp, w_end timestamp",
    )
    out = range_join_banded(
        points,
        intervals,
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        band=F.date_trunc("day", F.col("w_start")),
        point_band=F.date_trunc("day", F.col("ts")),
        end_band=F.date_trunc("day", F.col("w_end")),
        band_step=F.expr("INTERVAL 1 DAY"),
    )
    assert sorted((r.pid, r.iid) for r in out.collect()) == [(1, 10)]


def test_range_join_descending_grid_keeps_matches(spark):
    """A descending grid (negative band_step, band >= end_band for
    well-formed intervals) must replicate and match — the guard
    derives direction from the step instead of assuming ascending,
    which would silently drop every interval (r9 ADVICE)."""
    points = spark.createDataFrame(
        [(1, _ts("2024-01-02T12:00:00"))], "pid int, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            # healthy 3-band interval: matches
            (10, _ts("2024-01-01T00:00:00"), _ts("2024-01-03T23:00:00")),
            # inverted RELATIVE TO THE GRID DIRECTION: start-band
            # below end-band is fine ascending, but this row's span is
            # end-before-start — must drop under either direction
            (11, _ts("2024-01-05T00:00:00"), _ts("2024-01-01T00:00:00")),
        ],
        "iid int, w_start timestamp, w_end timestamp",
    )
    out = range_join_banded(
        points,
        intervals,
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        # grid walks DOWN from the end band to the start band
        band=F.date_trunc("day", F.col("w_end")),
        point_band=F.date_trunc("day", F.col("ts")),
        end_band=F.date_trunc("day", F.col("w_start")),
        band_step=F.expr("INTERVAL -1 DAY"),
    )
    assert sorted((r.pid, r.iid) for r in out.collect()) == [(1, 10)]


def test_decayed_trending_mass_and_shares(spark, sf_dir):
    from stacktrend_spark.plans.temporal import (
        _DECAY_WMAX,
        decayed_halflife_trending,
    )

    from stacktrend_spark.sources.tables import load_table

    rows = decayed_halflife_trending(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 < r["decayed_scaled"] <= r["n_events"] * (1 << _DECAY_WMAX)
        assert 0 <= r["recency_share_ppm"] <= 1000000


def test_position_attribution_mass_conservation(spark, sf_dir):
    """Every conversion's credits must sum to exactly 1e6 ppm — the
    integer remainder-to-first-touch contract, not a rounding hope."""
    from pyspark.sql import functions as F

    from stacktrend_spark.plans.behavioral import attribution_position_based
    from stacktrend_spark.sources.tables import load_table

    rows = attribution_position_based(spark, sf_dir).collect()
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["total_credit_ppm"] for r in rows) == n_purchases * 1000000
    assert {r["channel"] for r in rows} <= {"direct", "view", "click"}


def test_pinball_loss_asymmetry_and_bounds(spark, sf_dir):
    from stacktrend_spark.plans.temporal import pinball_loss_quantile_eval

    rows = pinball_loss_quantile_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 1
        assert r["pinball_x10_total"] >= 0
        assert r["mean_pinball_x10"] == r["pinball_x10_total"] // r["n_days"]
        assert 0 <= r["under_forecast_ppm"] <= 1000000


def test_drawdown_bounds(spark, sf_dir):
    from stacktrend_spark.plans.behavioral import running_max_drawdown

    rows = running_max_drawdown(spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r["rnk"] for r in rows) == list(range(1, 11))
    for r in rows:
        # drawdown can never exceed the peak it fell from
        assert 0 <= r["max_drawdown_cents"] <= r["peak_cents"]
        assert 0 <= r["drawdown_ppm_of_peak"] <= 1000000
