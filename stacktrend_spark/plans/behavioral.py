"""Behavioral analytics over the events table (beyond-reference).

The reference's analytics layer stops at per-entity aggregates; a
training-data / product-analytics engine also needs the classic
user-behavior shapes: cohort retention, ordered funnels, and
deterministic stratified sampling. All three are pure DataFrame plans
with DuckDB oracle twins.

Cross-engine determinism notes:
- week indexes are integer arithmetic on epoch days (both engines);
- the funnel's ordered stages use strict ``ts >`` comparisons on the
  original TIMESTAMP values (µs precision, identical in both engines);
- sampling is content-hashed: ``substr(md5(key), 1, 4)`` compared
  lexicographically against a per-stratum hex threshold — md5 hex is
  bit-identical across engines, so the sampled SET is too (no RNG, so
  retries/AQE re-plans at 100 TB cannot change the sample).

Scale notes: cohort/funnel shuffle once on user_id (the per-user
aggregates are tiny relative to raw events; AQE picks broadcast when
the user dimension fits). Stratified sampling is map-only — the
filter fuses into the parquet scan, zero shuffles before the final
summary agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import fround, iscale, sql_iscale, sql_round
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


def _week_idx(ts_col: str) -> F.Column:
    """Weeks since 1970-01-01 as exact integer arithmetic."""
    days = F.datediff(F.to_date(ts_col), F.to_date(F.lit("1970-01-01")))
    return F.floor(days / F.lit(7.0)).cast("long")


_SQL_WEEK = (
    "CAST(FLOOR(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT)"
)


@register(
    "cohort_retention_weekly",
    oracle=f"""
        WITH user_weeks AS (
            SELECT DISTINCT user_id, {_SQL_WEEK} AS week_idx FROM events
        ),
        cohorts AS (
            SELECT user_id, MIN(week_idx) AS cohort_week
            FROM user_weeks GROUP BY user_id
        )
        SELECT
            c.cohort_week,
            w.week_idx - c.cohort_week      AS offset_weeks,
            COUNT(DISTINCT w.user_id)       AS active_users
        FROM user_weeks w
        JOIN cohorts c ON w.user_id = c.user_id
        GROUP BY c.cohort_week, offset_weeks
    """,
    doc="Weekly cohort retention triangle: first-active week per user × offset.",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    user_weeks = events.select(
        "user_id", _week_idx("ts").alias("week_idx")
    ).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week_idx").alias("cohort_week")
    )
    return (
        user_weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("offset_weeks"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "funnel_signup_conversion",
    oracle=f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
            WHERE e.event_type = 'view' GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT
            (SELECT COUNT(*) FROM s1) AS signup_users,
            (SELECT COUNT(*) FROM s2) AS viewed_users,
            (SELECT COUNT(*) FROM s3) AS purchased_users,
            {sql_round("(SELECT COUNT(*) FROM s2) * 1.0 / (SELECT COUNT(*) FROM s1)", 6)}
                AS view_rate,
            {sql_round("(SELECT COUNT(*) FROM s3) * 1.0 / (SELECT COUNT(*) FROM s1)", 6)}
                AS purchase_rate
    """,
    doc="Strictly-ordered signup→view→purchase funnel with conversion rates.",
)
def funnel_signup_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    c1 = s1.agg(F.count("*").alias("signup_users"))
    c2 = s2.agg(F.count("*").alias("viewed_users"))
    c3 = s3.agg(F.count("*").alias("purchased_users"))
    return c1.crossJoin(c2).crossJoin(c3).select(
        "signup_users",
        "viewed_users",
        "purchased_users",
        fround(F.col("viewed_users") * F.lit(1.0) / F.col("signup_users"), 6).alias(
            "view_rate"
        ),
        fround(F.col("purchased_users") * F.lit(1.0) / F.col("signup_users"), 6).alias(
            "purchase_rate"
        ),
    )


# Per-stratum hex thresholds: keep-fraction f → first-4-hex-chars <
# hex(floor(f·16⁴)). 'g' sorts after every hex digit → keep-all.
_STRATA_THRESHOLDS = {
    "purchase": "g",  # 100%
    "signup": "g",  # 100%
    "view": "1999",  # ~10%
    "click": "1999",  # ~10%
    "error": "0ccc",  # ~5%
}


@register(
    "sample_stratified_hash",
    oracle=f"""
        WITH tagged AS (
            SELECT
                event_type, value,
                substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS h,
                CASE event_type
                    WHEN 'purchase' THEN 'g'
                    WHEN 'signup'   THEN 'g'
                    WHEN 'view'     THEN '1999'
                    WHEN 'click'    THEN '1999'
                    ELSE '0ccc'
                END AS thr
            FROM events
        )
        SELECT
            event_type,
            COUNT(*) AS total_rows,
            COUNT(CASE WHEN h < thr THEN 1 END) AS sampled_rows,
            CAST(COALESCE(SUM(CASE WHEN h < thr
                THEN {sql_iscale("value")} END), 0) AS DOUBLE) / 100.0
                AS sampled_value
        FROM tagged
        GROUP BY event_type
    """,
    doc="Deterministic stratified sampling: per-stratum md5-hex threshold, no RNG.",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    h = F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 4)
    thr = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in _STRATA_THRESHOLDS.items()
            if k != "error"
        ],
        F.lit(_STRATA_THRESHOLDS["error"]),
    )
    kept = h < thr
    return (
        events.select("event_type", "value", kept.alias("kept"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("total_rows"),
            F.count(F.when(F.col("kept"), 1)).alias("sampled_rows"),
            (
                F.coalesce(
                    F.sum(F.when(F.col("kept"), iscale("value"))), F.lit(0)
                ).cast("double")
                / F.lit(100.0)
            ).alias("sampled_value"),
        )
    )


@register(
    "sample_exact_k_per_group",
    # md5-hex ranks sort identically in both engines; the (hash, id)
    # tiebreaker makes the selected SET deterministic, and row_number
    # semantics agree — so the sample is bit-reproducible anywhere
    oracle="""
        WITH ranked AS (
            SELECT event_type, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                   ) AS rk
            FROM events
        )
        SELECT event_type,
               CAST(event_id AS BIGINT) AS event_id,
               CAST(rk AS BIGINT)       AS sample_rank
        FROM ranked WHERE rk <= 100
    """,
    doc=(
        "Exact-k-per-group deterministic sample (k=100): hash-ranked "
        "row_number per stratum — the reproducible fixed-size "
        "eval-split primitive (threshold sampling gives a RATE, this "
        "gives a COUNT). Per-group window, no global sort."
    ),
)
def sample_exact_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string").cast("binary"))
    rk = F.row_number().over(
        W.partitionBy("event_type").orderBy(h, F.col("event_id"))
    )
    return (
        ev.select("event_type", "event_id", rk.alias("sample_rank"))
        .filter(F.col("sample_rank") <= 100)
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
    )


@register(
    "event_pattern_match",
    # MATCH_RECOGNIZE-style sequence detection: a strict
    # view -> click -> purchase run (no intervening events for the
    # user) completing within 24 hours of the first step
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, event_type,
                   epoch_us(ts) AS t_us,
                   LAG(event_type, 1) OVER w AS p1_type,
                   LAG(event_type, 2) OVER w AS p2_type,
                   LAG(event_id, 2)  OVER w AS start_id,
                   LAG(t_us, 2)      OVER w AS start_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               start_id                           AS view_event_id,
               event_id                           AS purchase_event_id,
               CAST(t_us - start_us AS BIGINT)    AS elapsed_us
        FROM seq
        WHERE event_type = 'purchase'
          AND p1_type = 'click'
          AND p2_type = 'view'
          AND t_us - start_us <= 86400000000
    """,
    doc=(
        "Sequence-pattern detection (MATCH_RECOGNIZE analog): strict "
        "consecutive view->click->purchase within 24h via per-user "
        "ordered lags — one window partition per user, no self-joins, "
        "no per-user arrays; state is 2 lagged rows."
    ),
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.lag("event_type", 1).over(w).alias("p1_type"),
        F.lag("event_type", 2).over(w).alias("p2_type"),
        F.lag("event_id", 2).over(w).alias("start_id"),
        F.lag(F.unix_micros("ts"), 2).over(w).alias("start_us"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (F.col("p1_type") == "click")
            & (F.col("p2_type") == "view")
            & (F.col("t_us") - F.col("start_us") <= 86_400_000_000)
        )
        .select(
            "user_id",
            F.col("start_id").alias("view_event_id"),
            F.col("event_id").alias("purchase_event_id"),
            (F.col("t_us") - F.col("start_us")).cast("long").alias("elapsed_us"),
        )
    )
