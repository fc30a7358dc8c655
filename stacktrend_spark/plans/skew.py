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


# ---------------------------------------------------------------------------
# Partition-skew audit: before shuffling a 100 TB fact on a key, KNOW
# its partition histogram. Keys are assigned to 32 simulated shuffle
# partitions with the engine-neutral 40-bit md5 recipe (Spark's own
# murmur3 is not reproducible in the oracle; the md5 surrogate has the
# same uniformity properties the audit is measuring), then the audit
# reports the imbalance statistics that predict straggler tasks:
# max/avg ratio in ppm, the heaviest partition, and the share of rows
# in the top-4 partitions. Everything is integer-exact.
#
# 100 TB: one map-side-combined count per (bucket) — the audit itself
# never shuffles more than 32 rows past the first aggregate.
# ---------------------------------------------------------------------------
def _sql_md5mod(expr: str, m: int) -> str:
    hx = f"SUBSTR(md5(CAST({expr} AS VARCHAR)), 1, 10)"
    h = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({hx}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (9 - i)} AS BIGINT)"
        for i in range(10)
    )
    return f"(({h}) % {m})"


def _spark_md5mod(col: F.Column, m: int) -> F.Column:
    h = F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 10), 16, 10
    ).cast("long")
    return h % m


@register(
    "partition_skew_audit",
    oracle=f"""
        WITH b AS (
            SELECT {_sql_md5mod('o_custkey', 32)} AS bucket,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT bucket, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, bucket) AS r
            FROM b
        )
        SELECT
            CAST(COUNT(*) AS BIGINT)                          AS n_buckets,
            CAST(SUM(n) AS BIGINT)                            AS n_rows,
            CAST(MAX(n) AS BIGINT)                            AS max_rows,
            CAST(MIN(n) AS BIGINT)                            AS min_rows,
            CAST(MAX(n) * 32 * 1000000 // SUM(n) AS BIGINT)   AS max_over_avg_ppm,
            CAST(SUM(CASE WHEN r <= 4 THEN n ELSE 0 END)
                 * 1000000 // SUM(n) AS BIGINT)               AS top4_share_ppm
        FROM ranked
    """,
    doc="Shuffle-partition skew audit for orders.o_custkey over 32 "
    "simulated partitions (engine-neutral md5 assignment): max/avg ppm "
    "and top-4 share — the numbers that predict straggler tasks.",
)
def partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = (
        orders.select(_spark_md5mod(F.col("o_custkey"), 32).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W

    ranked = b.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("n"), F.asc("bucket")))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.min("n").cast("long").alias("min_rows"),
        F.expr("MAX(n) * 32 * 1000000 DIV SUM(n)")
        .cast("long")
        .alias("max_over_avg_ppm"),
        F.expr("SUM(CASE WHEN r <= 4 THEN n ELSE 0 END) * 1000000 DIV SUM(n)")
        .cast("long")
        .alias("top4_share_ppm"),
    )
