"""Oracle-checked skew-mitigation queries (operators/skew.py).

``event_type`` is the natural skew key in the testdata (a handful of
types over millions of events — the 100 TB shape where one hot key
stalls a reduce stage). Both queries are value-identical to their
unsalted forms, which is exactly what the DuckDB oracles assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import davg, iscale, sql_davg
from stacktrend_spark.operators.skew import salted_count_sum, salted_join
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

_BUCKETS = 8


@register(
    "skew_salted_agg",
    oracle="""
        SELECT
            event_type,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                AS sum_value_cents
        FROM events
        GROUP BY event_type
    """,
    doc="Two-phase salted aggregation over the hot event_type key — identical to plain groupBy.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return salted_count_sum(
        ev,
        keys=["event_type"],
        salt_src=F.col("event_id"),
        sum_cols={"sum_value_cents": iscale("value", 2)},
        buckets=_BUCKETS,
    )


@register(
    "skew_salted_join",
    oracle=f"""
        WITH stats AS (
            SELECT event_type, {sql_davg('value', 2, 6)} AS avg_value
            FROM events GROUP BY event_type
        )
        SELECT
            e.event_type,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            CAST(SUM(CASE WHEN e.value > s.avg_value THEN 1 ELSE 0 END) AS BIGINT)
                AS n_above_avg
        FROM events e JOIN stats s USING (event_type)
        GROUP BY e.event_type
    """,
    doc="Salted replicate-join of skewed events against per-type stats — identical to plain join.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(davg("value", 2, 6).alias("avg_value"))
    joined = salted_join(
        ev.select("event_type", "event_id", "value"),
        stats,
        key="event_type",
        salt_src=F.col("event_id"),
        buckets=_BUCKETS,
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("value") > F.col("avg_value"), 1).otherwise(0)
        ).alias("n_above_avg"),
    )
