"""Scalar-function families, arrays, JSON, pivot/rollup (SURVEY §2.8,
§2.2 P1-P12, plus the grouping extensions the reference lacks).

Covers every scalar family the reference uses — string cleaning
(bronze_to_silver_transformation.py:686-696), date/time arithmetic with
a pinned as_of_date (b2s:723-726 parameterized per SURVEY §4), math
clamping/log-scoring (b2s:778-782), when/otherwise tier chains
(data_transformer.py:253-266), array explode + co-occurrence
(silver_to_gold_analytics.py:603-630), JSON extraction (gdi:287-289 →
explicit from_json/get_json_object instead of schema inference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import (
    davg,
    dsum,
    fround,
    iscale,
    sql_davg,
    sql_dsum,
    sql_iscale,
    sql_round,
    sql_xlog10,
    xlog10,
)
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# String family (P11, §2.8 string): regexp cleaning, lower/trim/length,
# split word-count, contains-CASE — the description-sanitize chain.
# ---------------------------------------------------------------------------
@register(
    "scalar_string_clean",
    oracle="""
        SELECT
            p_partkey,
            TRIM(REGEXP_REPLACE(LOWER(p_name), '[^a-z ]', '', 'g'))     AS clean_name,
            CAST(LENGTH(TRIM(REGEXP_REPLACE(LOWER(p_name), '[^a-z ]', '', 'g'))) AS BIGINT) AS name_len,
            CAST(LEN(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(p_name), '[^a-z ]', '', 'g')), ' ')) AS BIGINT) AS n_words,
            UPPER(SUBSTR(p_name, 1, 5))                                 AS name_prefix,
            CASE WHEN LOWER(p_name) LIKE '%green%' THEN 'green-family'
                 WHEN LOWER(p_name) LIKE '%blue%'  THEN 'blue-family'
                 ELSE 'other' END                                       AS color_family
        FROM part
        WHERE p_partkey <= 500
    """,
    doc="String cleaning chain (regexp_replace/lower/trim/length/split/contains-CASE).",
)
def scalar_string_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    clean = F.trim(F.regexp_replace(F.lower(F.col("p_name")), "[^a-z ]", ""))
    lower_name = F.lower(F.col("p_name"))
    return part.select(
        "p_partkey",
        clean.alias("clean_name"),
        F.length(clean).cast("long").alias("name_len"),
        F.size(F.split(clean, " ")).cast("long").alias("n_words"),
        F.upper(F.substring(F.col("p_name"), 1, 5)).alias("name_prefix"),
        F.when(lower_name.contains("green"), "green-family")
        .when(lower_name.contains("blue"), "blue-family")
        .otherwise("other")
        .alias("color_family"),
    )


# ---------------------------------------------------------------------------
# Date/time family (§2.8): to_timestamp parts, datediff vs a pinned
# as_of_date (no current_date() — SURVEY §4 anti-pattern 4), interval add.
# ---------------------------------------------------------------------------
_AS_OF = "2002-01-01"


@register(
    "scalar_datetime_parts",
    oracle=f"""
        SELECT
            o_orderkey,
            CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)     AS order_year,
            CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)    AS order_month,
            CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT)  AS order_quarter,
            CAST(EXTRACT(day FROM o_orderdate) AS BIGINT)      AS order_day,
            CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '{_AS_OF}') AS BIGINT) AS age_days,
            o_orderdate + INTERVAL 30 DAY                      AS followup_ts
        FROM orders
        WHERE o_orderkey <= 2000
    """,
    doc="Date part extraction + datediff from pinned as_of_date + interval arithmetic.",
)
def scalar_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.datediff(F.lit(_AS_OF).cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("age_days"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("followup_ts"),
    )


# ---------------------------------------------------------------------------
# Math family (§2.8): log10 scoring + least/greatest clamping — the
# momentum-score expression shape (b2s:778-782, s2g:173-176), with the
# reference's F.rand() placeholder replaced by a deterministic input
# (SURVEY §4 anti-pattern 3).
# ---------------------------------------------------------------------------
_POP_IDOLLARS = f"GREATEST(({sql_iscale('c_acctbal')}) // 100, 1)"
_POP_SCORE_SQL = sql_round(
    f"LEAST(100.0, GREATEST(0.0, {sql_xlog10(_POP_IDOLLARS)} * 25.0))", 6
)


@register(
    "scalar_math_scores",
    oracle=f"""
        SELECT
            c_custkey,
            {_POP_SCORE_SQL} AS popularity_score,
            {sql_round('SQRT(ABS(c_acctbal))', 6)}                    AS dispersion_component,
            {sql_round('LEAST(10.0, GREATEST(0.0, c_acctbal / 1000.0))', 6)} AS clamped_kbal
        FROM customer
        WHERE c_custkey <= 500
    """,
    doc="log10/sqrt scoring with least/greatest clamping — deterministic momentum-score shape.",
)
def scalar_math_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    bal = F.col("c_acctbal")
    # popularity: log-scaled balance via xlog10 over exact integer
    # dollars (iscale cents DIV 100) — libm LOG10 is not correctly
    # rounded and ulp-flips hashed fround(·,6) across engines.
    # dispersion: SQRT is IEEE-correctly-rounded, so sqrt(abs(x)) over a
    # parquet-read value is bit-identical in both engines — safe as-is.
    idollars = F.greatest(
        (iscale(bal) - F.pmod(iscale(bal), F.lit(100))) / F.lit(100), F.lit(1)
    ).cast("long")
    return customer.select(
        "c_custkey",
        fround(
            F.least(F.lit(100.0), F.greatest(F.lit(0.0), xlog10(idollars) * 25.0)),
            6,
        ).alias("popularity_score"),
        fround(F.sqrt(F.abs(bal)), 6).alias("dispersion_component"),
        fround(F.least(F.lit(10.0), F.greatest(F.lit(0.0), bal / 1000.0)), 6).alias(
            "clamped_kbal"
        ),
    )


# ---------------------------------------------------------------------------
# Conditional family: the popularity-tier when/otherwise chain
# (data_transformer.py:253-266 thresholds, re-scaled to acctbal).
# ---------------------------------------------------------------------------
@register(
    "scalar_conditional_tiers",
    oracle=f"""
        SELECT
            CASE WHEN c_acctbal >= 5000 THEN 'S'
                 WHEN c_acctbal >= 2500 THEN 'A'
                 WHEN c_acctbal >= 1000 THEN 'B'
                 WHEN c_acctbal >= 100  THEN 'C'
                 WHEN c_acctbal >= 10   THEN 'D'
                 ELSE 'F' END                       AS balance_tier,
            CAST(COUNT(*) AS BIGINT)                AS n_customers,
            {sql_davg('c_acctbal')}                 AS avg_acctbal,
            {sql_dsum('c_acctbal')}                 AS total_acctbal
        FROM customer
        GROUP BY 1
    """,
    doc="when/otherwise tier chain (51 call sites in the reference) + per-tier rollup.",
)
def scalar_conditional_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    tier = (
        F.when(bal >= 5000, "S")
        .when(bal >= 2500, "A")
        .when(bal >= 1000, "B")
        .when(bal >= 100, "C")
        .when(bal >= 10, "D")
        .otherwise("F")
    )
    return customer.groupBy(tier.alias("balance_tier")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        davg("c_acctbal").alias("avg_acctbal"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


# ---------------------------------------------------------------------------
# Array family (P8, §2.8 array): split → explode → self-join
# co-occurrence with HAVING (the adoption_matrix composition,
# silver_to_gold_analytics.py:603-630: explode topics, topic != category
# filter P9, pair counts, co_occurrence_count >= 3 P12).
# ---------------------------------------------------------------------------
@register(
    "array_word_cooccurrence",
    oracle="""
        WITH words AS (
            SELECT DISTINCT p_partkey, UNNEST(STRING_SPLIT(LOWER(p_name), ' ')) AS word
            FROM part
        )
        SELECT
            a.word                     AS word_a,
            b.word                     AS word_b,
            CAST(COUNT(*) AS BIGINT)   AS co_occurrence_count
        FROM words a
        JOIN words b ON a.p_partkey = b.p_partkey AND a.word < b.word
        GROUP BY a.word, b.word
        HAVING COUNT(*) >= 3
    """,
    doc="explode → pair self-join → HAVING: the adoption_matrix co-occurrence composition.",
)
def array_word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    words = (
        part.select(
            "p_partkey", F.explode(F.split(F.lower(F.col("p_name")), " ")).alias("word")
        )
        .distinct()
    )
    a = words.alias("a")
    b = words.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_partkey") == F.col("b.p_partkey"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b"))
        .agg(F.count(F.lit(1)).alias("co_occurrence_count"))
        .filter(F.col("co_occurrence_count") >= 3)
    )


# ---------------------------------------------------------------------------
# JSON family (S4 ⟲): the reference infers schemas from raw API JSON
# (github_data_ingestion.py:287-289); we parse explicitly instead.
# events.props is a JSON string column.
# ---------------------------------------------------------------------------
@register(
    "json_extract_props",
    oracle=f"""
        SELECT
            CAST(CAST(props->>'$.k' AS INTEGER) % 10 AS BIGINT) AS k_bucket,
            CAST(COUNT(*) AS BIGINT)                            AS n_events,
            {sql_dsum('value')}                                 AS total_value,
            CAST(MIN(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS min_k,
            CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS max_k
        FROM events
        GROUP BY 1
    """,
    doc="Explicit JSON extraction (replaces schema-inference ingestion S4 ⟲) + rollup.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).cast("long").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot (beyond-reference; Spark .pivot with explicit values so no
# extra values-discovery job) — order status × market segment.
# ---------------------------------------------------------------------------
@register(
    "pivot_status_by_segment",
    oracle="""
        SELECT
            c.c_mktsegment AS mktsegment,
            CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
            CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
            CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    doc="Pivot with explicit value list (no discovery pass) — count matrix.",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    status = F.col("o_orderstatus")
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.sum(F.when(status == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(status == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(status == "P", 1).otherwise(0)).alias("n_pending"),
    )


# ---------------------------------------------------------------------------
# Rollup + grouping id (beyond-reference — SURVEY §2.4 notes cube/rollup
# "available free if we extend"): hierarchical subtotals.
# ---------------------------------------------------------------------------
@register(
    "rollup_revenue",
    oracle=f"""
        SELECT
            c.c_mktsegment    AS mktsegment,
            o.o_orderpriority AS priority,
            CAST(GROUPING(c.c_mktsegment) * 2 + GROUPING(o.o_orderpriority) AS BIGINT) AS gid,
            CAST(COUNT(*) AS BIGINT) AS n_orders,
            {sql_dsum('o.o_totalprice')} AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY ROLLUP (c.c_mktsegment, o.o_orderpriority)
    """,
    doc="ROLLUP subtotals + grouping-id — grouping-sets capability beyond the reference.",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return joined.rollup("mktsegment", "priority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Unpivot/melt — the dual of pivot_status_by_segment (wide metric
# columns → long (metric, value) rows). Map-side Expand, no shuffle
# beyond the feeding aggregate.
# ---------------------------------------------------------------------------
@register(
    "unpivot_flag_metrics",
    oracle=f"""
        WITH wide AS (
            SELECT
                l_returnflag,
                {sql_dsum('l_extendedprice')}         AS sum_price,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                CAST(COUNT(*) AS DOUBLE)              AS n_items
            FROM lineitem GROUP BY l_returnflag
        )
        UNPIVOT wide ON sum_price, sum_qty, n_items
        INTO NAME metric VALUE metric_value
    """,
    doc="Unpivot (melt): wide per-flag metrics to long (metric, value) rows via Expand.",
)
def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_extendedprice").alias("sum_price"),
        F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_price", "sum_qty", "n_items"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


# ---------------------------------------------------------------------------
# Error-safe scalar functions (try_*) — dirty-data hygiene. At 100 TB a
# single malformed cell must produce a NULL, not kill the job (ANSI
# mode would throw). Corruption is synthesized deterministically so the
# cleaning behavior itself is oracle-checked.
# ---------------------------------------------------------------------------
@register(
    "scalar_try_clean",
    oracle="""
        WITH dirty AS (
            SELECT
                event_id,
                CASE WHEN event_id % 7 = 0 THEN 'x' || CAST(value AS VARCHAR)
                     ELSE CAST(value AS VARCHAR) END AS num_str,
                CAST(event_id % 5 AS BIGINT) AS den,
                value,
                CASE WHEN event_id % 3 = 0 THEN 'garbage'
                     ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_str
            FROM events
        )
        SELECT
            event_id,
            TRY_CAST(num_str AS DOUBLE)                  AS parsed_value,
            value / NULLIF(den, 0)                       AS safe_ratio,
            epoch_us(TRY_CAST(ts_str AS TIMESTAMP))      AS reparsed_ts_us
        FROM dirty
    """,
    doc="try_cast / try_divide / try_to_timestamp: malformed cells become NULLs, never errors.",
)
def scalar_try_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    num_str = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("x"), F.col("value").cast("string"))
    ).otherwise(F.col("value").cast("string"))
    ts_str = F.when(F.col("event_id") % 3 == 0, F.lit("garbage")).otherwise(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    den = (F.col("event_id") % 5).cast("long")
    return ev.select(
        "event_id",
        num_str.try_cast("double").alias("parsed_value"),
        F.try_divide(F.col("value"), F.nullif(den, F.lit(0))).alias("safe_ratio"),
        F.unix_micros(F.try_to_timestamp(ts_str)).alias("reparsed_ts_us"),
    )
