"""Oracle-checked merge-policy queries (SURVEY §2.1 S11/S12/S14).

Each query builds a deterministic (target, source) pair from the
testdata, applies one of the merge operators, and returns the merged
table so the DuckDB oracle can hash-match the exact post-merge state.
The oracle re-expresses each policy in plain ANSI SQL (anti-join +
union), which is also the semantic spec the operators implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import fround, sql_round
from stacktrend_spark.operators.merge import (
    merge_insert_only,
    merge_preserve,
    merge_upsert,
)
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# S11 — plain upsert. Target: all orders. Source: every 7th customer's
# orders re-delivered with a 10% price bump and status 'U'.
# ---------------------------------------------------------------------------
@register(
    "merge_upsert_orders",
    oracle=f"""
        WITH source AS (
            SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   {sql_round('o_totalprice * 1.1', 2)} AS o_totalprice
            FROM orders WHERE o_custkey % 7 = 0
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM source
        UNION ALL
        SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = o.o_orderkey)
    """,
    doc="Plain keyed upsert (S11): update matched, insert new — MERGE emulation.",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    source = (
        orders.filter(F.col("o_custkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            fround(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
    )
    return merge_upsert(orders, source, ["o_orderkey"])


# ---------------------------------------------------------------------------
# S12 — insert-only merge (immutable events): a re-delivered batch that
# overlaps the target must not duplicate rows, and duplicate deliveries
# within the batch must collapse.
# ---------------------------------------------------------------------------
@register(
    "merge_insert_only_events",
    oracle="""
        WITH target AS (
            SELECT event_id, event_type, user_id, value FROM events WHERE event_id % 2 = 0
        ),
        batch AS (
            -- re-delivered batch: overlaps target AND contains internal dups
            SELECT event_id, event_type, user_id, value FROM events WHERE event_id % 3 = 0
            UNION ALL
            SELECT event_id, event_type, user_id, value FROM events WHERE event_id % 6 = 0
        ),
        merged AS (
            SELECT * FROM target
            UNION ALL
            SELECT DISTINCT b.* FROM batch b
            WHERE NOT EXISTS (
                SELECT 1 FROM target t
                WHERE t.event_id = b.event_id AND t.event_type = b.event_type
            )
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)              AS n_events,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_ids
        FROM merged
        GROUP BY event_type
    """,
    doc="Insert-only merge on composite identity (S12): dedup-on-write for immutable events.",
)
def merge_insert_only_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    target = ev.filter(F.col("event_id") % 2 == 0)
    batch = ev.filter(F.col("event_id") % 3 == 0).unionByName(
        ev.filter(F.col("event_id") % 6 == 0)
    )
    merged = merge_insert_only(target, batch, ["event_id", "event_type"])
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
    )


# ---------------------------------------------------------------------------
# S14 — conditional-preserve merge, the reference's core "smart merge":
# a well-classified target row (confidence >= 0.8, category != 'Other')
# keeps its classification columns while its metric columns refresh;
# everything else takes the incoming values. Classification columns are
# derived deterministically from custkey so both engines agree.
# ---------------------------------------------------------------------------
@register(
    "merge_preserve_classification",
    oracle=f"""
        WITH target AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 10 < 3 THEN 'Other'
                        ELSE 'Cat' || CAST(c_custkey % 10 AS VARCHAR) END AS category,
                   CAST(c_custkey % 100 AS DOUBLE) / 100.0               AS confidence,
                   c_acctbal                                             AS balance
            FROM customer WHERE c_custkey <= 1200
        ),
        source AS (
            SELECT c_custkey,
                   'Reclassified'                          AS category,
                   0.5                                     AS confidence,
                   {sql_round('c_acctbal + 100.0', 2)}     AS balance
            FROM customer
        )
        SELECT s.c_custkey,
               CASE WHEN t.confidence >= 0.8 AND t.category <> 'Other'
                    THEN t.category ELSE s.category END    AS category,
               CASE WHEN t.confidence >= 0.8 AND t.category <> 'Other'
                    THEN t.confidence ELSE s.confidence END AS confidence,
               s.balance                                    AS balance
        FROM source s LEFT JOIN target t ON s.c_custkey = t.c_custkey
    """,
    doc="Conditional-preserve merge (S14): the 90%%-LLM-cost-saving smart merge semantic.",
)
def merge_preserve_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    target = customer.filter(key <= 1200).select(
        "c_custkey",
        F.when(key % 10 < 3, "Other")
        .otherwise(F.concat(F.lit("Cat"), (key % 10).cast("string")))
        .alias("category"),
        ((key % 100).cast("double") / 100.0).alias("confidence"),
        F.col("c_acctbal").alias("balance"),
    )
    source = customer.select(
        "c_custkey",
        F.lit("Reclassified").alias("category"),
        F.lit(0.5).alias("confidence"),
        fround(F.col("c_acctbal") + 100.0, 2).alias("balance"),
    )
    preserve_when = (F.col("t.confidence") >= 0.8) & (F.col("t.category") != "Other")
    return merge_preserve(
        target,
        source,
        keys=["c_custkey"],
        preserve_cols=["category", "confidence"],
        preserve_when=preserve_when,
    )


# ---------------------------------------------------------------------------
# Full-sync merge (r7) — WHEN NOT MATCHED BY SOURCE THEN DELETE,
# partition-scoped: the daily re-sync that repairs the 1998+ slice of
# the orders table from a corrected feed. The feed drops every 7th
# order (deletions), re-prices the rest (updates); pre-1998 rows are
# untouched. Output is the per-year contract of the synced table
# (counts + exact cents), so deletions, updates and the untouched
# remainder are all visible to the value hash.
# ---------------------------------------------------------------------------
@register(
    "merge_full_sync_orders",
    oracle="""
        WITH scope AS (
            SELECT * FROM orders WHERE o_orderdate >= DATE '1998-01-01'
        ),
        source AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
                   CAST(FLOOR((o_totalprice * 1.05) * 100.0 + 0.5) AS BIGINT)
                       AS cents
            FROM scope WHERE o_orderkey % 7 <> 0
        ),
        synced AS (
            SELECT o_orderkey, o_orderdate, cents FROM source
            UNION ALL
            SELECT o_orderkey, o_orderdate,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
            FROM orders WHERE o_orderdate < DATE '1998-01-01'
        )
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(COUNT(*) AS BIGINT)                       AS n_orders,
               CAST(SUM(cents) AS BIGINT)                     AS sum_cents
        FROM synced GROUP BY 1
    """,
    doc=(
        "Partition-scoped full-sync MERGE (not-matched-by-source "
        "DELETE): the 1998+ slice re-synced from a corrected feed "
        "(every 7th order deleted, the rest re-priced +5%), pre-1998 "
        "untouched; per-year counts + exact cents expose all three "
        "clause effects."
    ),
)
def merge_full_sync_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.rounding import fround, iscale
    from stacktrend_spark.operators.merge import merge_full_sync

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    scope = F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    source = (
        orders.filter(scope)
        .filter(F.col("o_orderkey") % 7 != 0)
        .withColumn("o_totalprice", fround(F.col("o_totalprice") * 1.05, 2))
    )
    synced = merge_full_sync(orders, source, ["o_orderkey"], scope)
    return synced.groupBy(
        F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(iscale("o_totalprice")).cast("long").alias("sum_cents"),
    )
