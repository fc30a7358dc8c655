"""As-of and banded range join queries over the events table.

Oracle notes: DuckDB has a native ASOF JOIN — the Spark side must
reproduce its exact semantics (backward, inclusive) with the
union+window plan from operators/temporal.py. Timestamps are emitted
as epoch-µs longs throughout (the repo's cross-engine convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.operators.temporal import asof_join, range_join_banded
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


@register(
    "asof_purchase_login",
    # DuckDB ASOF JOIN picks the right row with the LARGEST right.ts
    # <= left.ts per key — exactly the backward-inclusive semantics of
    # operators/temporal.asof_join. Ties inside the right side (two
    # logins at the same instant) don't occur in the testdata; the
    # event_id tiebreaker below is for the LEFT side only.
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        logins AS (
            SELECT event_id AS login_event_id, user_id, ts AS login_ts
            FROM events WHERE event_type = 'login'
        )
        SELECT
            p.event_id,
            p.user_id,
            epoch_us(p.ts)                         AS ts_us,
            p.value,
            l.login_event_id                       AS asof_event_id,
            epoch_us(l.login_ts)                   AS asof_ts_us,
            epoch_us(p.ts) - epoch_us(l.login_ts)  AS gap_us
        FROM purchases p
        ASOF LEFT JOIN logins l
            ON p.user_id = l.user_id AND p.ts >= l.login_ts
    """,
    doc="As-of join: each purchase ⟵ most recent prior login per user (union+window plan).",
)
def asof_purchase_login(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    logins = events.filter(F.col("event_type") == "login").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases,
        logins,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.col("asof_event_id"),
        F.unix_micros("asof_ts").alias("asof_ts_us"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


@register(
    "range_join_halfday_windows",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('day', MIN(ts)) AS t0 FROM events
        ),
        intervals AS (
            SELECT
                k AS window_id,
                t0 + to_microseconds(k * 86400000000 + 21600000000) AS w_start,
                t0 + to_microseconds(k * 86400000000 + 64800000000) AS w_end
            FROM bounds, UNNEST(range(30)) AS t(k)
        )
        SELECT
            i.window_id,
            CAST(COUNT(*) AS BIGINT)                 AS n_events,
            CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e
        JOIN intervals i
          ON e.ts >= i.w_start AND e.ts < i.w_end
        GROUP BY i.window_id
    """,
    doc="Banded range join: 30 half-day windows × events via day-bucket equi-join + exact check.",
)
def range_join_halfday_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    t0 = events.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    # 30 half-day windows [06:00, 18:00) on consecutive days — each
    # interval sits inside one day-band by construction
    intervals = (
        spark.range(30)
        .withColumnRenamed("id", "window_id")
        .crossJoin(F.broadcast(t0))
        .select(
            "window_id",
            F.timestamp_micros(
                F.unix_micros("t0") + F.col("window_id") * 86_400_000_000 + 21_600_000_000
            ).alias("w_start"),
            F.timestamp_micros(
                F.unix_micros("t0") + F.col("window_id") * 86_400_000_000 + 64_800_000_000
            ).alias("w_end"),
        )
    )
    joined = range_join_banded(
        events,
        intervals,
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        band=F.date_trunc("day", F.col("w_start")),
        point_band=F.date_trunc("day", F.col("ts")),
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
