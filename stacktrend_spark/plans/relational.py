"""Relational core: scans, projections, filters, aggregations, joins,
set ops (SURVEY §2.1-2.4, §2.7) over the harness testdata tables.

Each query mirrors an operator family the reference exercises; the
Spark side is written plan-first (filters early so they push to the
parquet scan, broadcast hints on dimension tables, single-pass
aggregations) and the oracle is the same query in ANSI SQL for DuckDB.
All computed doubles go through the shared deterministic rounding
(functions/rounding.py) so both engines emit bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import (
    davg,
    dstd,
    dsum,
    fround,
    iscale,
    sql_davg,
    sql_dstd,
    sql_dsum,
    sql_iscale,
    sql_round,
)
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# A1/A6/A7 — hash aggregate, one pass, many aggs (the reference's
# tech-level rollup shape, silver_to_gold_analytics.py:133-156).
# TPC-H Q1-shaped pricing summary over lineitem.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
        SELECT
            l_returnflag,
            l_linestatus,
            {sql_dsum('l_quantity', 0)}                                         AS sum_qty,
            {sql_dsum('l_extendedprice', 2)}                                    AS sum_base_price,
            CAST(SUM({sql_iscale('l_extendedprice', 2)}
                     * (100 - {sql_iscale('l_discount', 2)})) AS DOUBLE) / 1e4  AS sum_disc_price,
            CAST(SUM({sql_iscale('l_extendedprice', 2)}
                     * (100 - {sql_iscale('l_discount', 2)})
                     * (100 + {sql_iscale('l_tax', 2)})) AS DOUBLE) / 1e6       AS sum_charge,
            {sql_davg('l_quantity', 0)}                                         AS avg_qty,
            {sql_davg('l_extendedprice', 2)}                                    AS avg_price,
            {sql_davg('l_discount', 2)}                                         AS avg_disc,
            CAST(COUNT(*) AS BIGINT)                                            AS count_order,
            CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)                          AS n_orders
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: one-pass multi-agg hash groupBy (A1/A6/A7); filter pushed to scan.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 0).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            (
                F.sum(iscale("l_extendedprice") * (100 - iscale("l_discount")))
                / F.lit(1e4)
            ).alias("sum_disc_price"),
            (
                F.sum(
                    iscale("l_extendedprice")
                    * (100 - iscale("l_discount"))
                    * (100 + iscale("l_tax"))
                )
                / F.lit(1e6)
            ).alias("sum_charge"),
            davg("l_quantity", 0).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J2-style inner equi-join chain with broadcast dims — revenue by nation.
# Mirrors the reference's only join topology (equi on a single key,
# SURVEY §2.3) at the scan→join→agg shape of a gold rollup.
# nation/region are tiny: broadcast, no shuffle on the big side.
# ---------------------------------------------------------------------------
@register(
    "join_revenue_by_nation",
    oracle=f"""
        SELECT
            n.n_name                                  AS nation,
            r.r_name                                  AS region,
            CAST(COUNT(*) AS BIGINT)                  AS n_orders,
            {sql_dsum('o.o_totalprice')}                 AS revenue,
            {sql_davg('o.o_totalprice')}                 AS avg_order_value,
            CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    """,
    doc="Multi-way inner equi-join (J2) with broadcast dimension tables.",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            davg("o_totalprice").alias("avg_order_value"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — left outer join + null-aware aggregation (portfolio ⟕ activity,
# personal_repos_silver_to_gold.py:166-176): customers with zero orders
# must survive the join and be countable.
# ---------------------------------------------------------------------------
@register(
    "join_left_customer_orders",
    oracle=f"""
        SELECT
            c.c_mktsegment                                        AS mktsegment,
            CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT)           AS n_customers,
            CAST(COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL
                       THEN c.c_custkey END) AS BIGINT)           AS n_inactive,
            CAST(COUNT(o.o_orderkey) AS BIGINT)                   AS n_orders,
            {sql_dsum('COALESCE(o.o_totalprice, 0)')}             AS revenue
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    doc="Left outer equi-join (J3) + coalesce null-handling (§2.8).",
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct(
                F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
            ).alias("n_inactive"),
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — left-anti equi-join (the "skip already-classified" split,
# bronze_to_silver_transformation.py:474): customers with NO recent
# orders (date-window restricted so the anti set is non-empty).
# ---------------------------------------------------------------------------
@register(
    "join_anti_inactive_customers",
    oracle=f"""
        SELECT
            n.n_name                           AS nation,
            CAST(COUNT(*) AS BIGINT)           AS n_inactive,
            {sql_davg('c.c_acctbal')}          AS avg_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        GROUP BY n.n_name
    """,
    doc="Left-anti join (J1) — the smart-classification skip split.",
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    inactive = customer.join(recent, "c_custkey", "left_anti")
    return (
        inactive.join(F.broadcast(nation), inactive.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_inactive"),
            davg("c_acctbal").alias("avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J2 (semi role) — left-semi join (the "needs metrics-only update" split,
# bronze_to_silver_transformation.py:475): suppliers with 1995 shipments.
# ---------------------------------------------------------------------------
@register(
    "join_semi_active_suppliers",
    oracle=f"""
        SELECT
            n.n_name                          AS nation,
            CAST(COUNT(*) AS BIGINT)          AS n_suppliers,
            {sql_dsum('s.s_acctbal')}          AS total_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey
              AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        )
        GROUP BY n.n_name
    """,
    doc="Left-semi join (J2-as-EXISTS) with a pushed-down range predicate.",
)
def join_semi_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li_1995 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    active = supplier.join(li_1995, "s_suppkey", "left_semi")
    return (
        active.join(F.broadcast(nation), active.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum("s_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# A5/A11 — global (no-key) aggregate, the market_pulse single-row shape
# (silver_to_gold_analytics.py:567-580). Stays in-plan: no collect().
# ---------------------------------------------------------------------------
@register(
    "agg_global_market_pulse",
    oracle=f"""
        SELECT
            CAST(COUNT(*) AS BIGINT)                     AS n_orders,
            CAST(COUNT(DISTINCT o_custkey) AS BIGINT)    AS n_customers,
            {sql_dsum('o_totalprice')}                   AS total_revenue,
            {sql_davg('o_totalprice')}                   AS avg_order_value,
            {sql_round('MAX(o_totalprice)', 2)}          AS max_order_value,
            {sql_round('MIN(o_totalprice)', 2)}          AS min_order_value
        FROM orders
    """,
    doc="Global no-key aggregate (A5); replaces the reference's collect()-scalar pattern (A11 ⟲).",
)
def agg_global_market_pulse(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice").alias("total_revenue"),
        davg("o_totalprice").alias("avg_order_value"),
        fround(F.max("o_totalprice"), 2).alias("max_order_value"),
        fround(F.min("o_totalprice"), 2).alias("min_order_value"),
    )


# ---------------------------------------------------------------------------
# A6 — conditional aggregation: sum(when(cond,1)) count-ifs
# (silver_to_gold_analytics.py:151,418,467; prb2s:592-594).
# ---------------------------------------------------------------------------
@register(
    "agg_conditional_by_priority",
    oracle=f"""
        SELECT
            o_orderpriority                                              AS priority,
            CAST(COUNT(*) AS BIGINT)                                     AS n_orders,
            CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
            CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
            CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
            {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS finished_revenue
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Conditional aggregates (A6): count-if / sum-if pivots by status.",
)
def agg_conditional_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_big"),
        dsum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)).alias("finished_revenue"),
    )


# ---------------------------------------------------------------------------
# A8 — stddev aggregation (star-dispersion / volatility,
# silver_to_gold_analytics.py:469,576).
# ---------------------------------------------------------------------------
@register(
    "agg_stddev_acctbal",
    oracle=f"""
        SELECT
            n.n_name                                     AS nation,
            CAST(COUNT(*) AS BIGINT)                     AS n_customers,
            {sql_davg('c.c_acctbal')}                    AS avg_acctbal,
            {sql_dstd('c.c_acctbal')}                    AS stddev_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="Sample stddev per group (A8) — dispersion metrics.",
)
def agg_stddev_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal").alias("avg_acctbal"),
            # dstd: exact scaled-integer sums → fixed IEEE op tree;
            # STDDEV_SAMP's summation order is engine-dependent.
            dstd("c_acctbal").alias("stddev_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# A9/A12 ⟲ — distinct rows + dropDuplicates replacing the reference's
# driver-side seen-set dedup (github_data_ingestion.py:199-219).
# ---------------------------------------------------------------------------
@register(
    "distinct_status_priority",
    oracle="""
        SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority
        FROM orders
    """,
    doc="Distinct combinations (A9); distributed dedup replacing driver-side seen-set (A12 ⟲).",
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    ).distinct()


# ---------------------------------------------------------------------------
# U2 — per-period metrics union (the 7d/30d/90d loop,
# personal_repos_bronze_to_silver.py:578-634) over the events table,
# with a pinned as-of date (SURVEY §4 anti-pattern 4: no datetime.now()).
# ---------------------------------------------------------------------------
_EVENTS_AS_OF = "2024-01-31 00:00:00"


@register(
    "union_period_metrics",
    oracle=f"""
        SELECT * FROM (
            SELECT
                '7d'                                  AS measurement_period,
                event_type,
                CAST(COUNT(*) AS BIGINT)              AS n_events,
                {sql_dsum('value')}                  AS total_value,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
            WHERE ts >= TIMESTAMP '{_EVENTS_AS_OF}' - INTERVAL 7 DAY
            GROUP BY event_type
            UNION ALL
            SELECT '30d', event_type, CAST(COUNT(*) AS BIGINT),
                   {sql_dsum('value')}, CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events
            WHERE ts >= TIMESTAMP '{_EVENTS_AS_OF}' - INTERVAL 30 DAY
            GROUP BY event_type
            UNION ALL
            SELECT '90d', event_type, CAST(COUNT(*) AS BIGINT),
                   {sql_dsum('value')}, CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events
            WHERE ts >= TIMESTAMP '{_EVENTS_AS_OF}' - INTERVAL 90 DAY
            GROUP BY event_type
        ) t
    """,
    doc="Iterated union of per-period aggregates (U2) with pinned as_of_date.",
)
def union_period_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    as_of = F.lit(_EVENTS_AS_OF).cast("timestamp")

    def period(days: int, label: str) -> DataFrame:
        return (
            events.filter(F.col("ts") >= as_of - F.expr(f"INTERVAL {days} DAYS"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .select(
                F.lit(label).alias("measurement_period"),
                "event_type",
                "n_events",
                "total_value",
                "n_users",
            )
        )

    return period(7, "7d").union(period(30, "30d")).union(period(90, "90d"))


# ---------------------------------------------------------------------------
# Correlated subqueries — EXISTS / NOT EXISTS and a correlated scalar.
# Catalyst rewrites these to semi/anti joins and a re-grouped join
# respectively (decorrelation), so the SQL-level subquery surface rides
# the same scale path as the explicit join queries.
# ---------------------------------------------------------------------------
@register(
    "subquery_exists_orders",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        )
    """,
    doc="Correlated EXISTS + NOT EXISTS — decorrelated to semi ⋈ anti joins by Catalyst.",
)
def subquery_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM _sq_customer c
        WHERE EXISTS (
            SELECT 1 FROM _sq_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        AND NOT EXISTS (
            SELECT 1 FROM _sq_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        )
        """
    )


@register(
    "subquery_scalar_above_avg",
    # AVG over exact int cents: one sum + one division per group in
    # BOTH engines → bit-identical threshold, deterministic comparison
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_custkey, o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders
        )
        SELECT
            o_orderpriority,
            CAST(COUNT(*) AS BIGINT) AS n_above_own_avg
        FROM o
        WHERE cents > (
            SELECT AVG(o2.cents) FROM o o2 WHERE o2.o_custkey = o.o_custkey
        )
        GROUP BY o_orderpriority
    """,
    doc="Correlated scalar subquery (price above the customer's own average), decorrelated.",
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq2_orders")
    return spark.sql(
        """
        WITH o AS (
            SELECT o_orderkey, o_custkey, o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM _sq2_orders
        )
        SELECT
            o_orderpriority,
            CAST(COUNT(*) AS BIGINT) AS n_above_own_avg
        FROM o
        WHERE cents > (
            SELECT AVG(o2.cents) FROM o o2 WHERE o2.o_custkey = o.o_custkey
        )
        GROUP BY o_orderpriority
        """
    )


@register(
    "agg_mode_nation_per_segment",
    # mode via two-phase count + deterministic argmax (highest count,
    # lowest key on ties) — no engine-specific MODE() function, so both
    # engines compute the identical row.
    oracle="""
        WITH c AS (
            SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2
        ),
        r AS (
            SELECT c_mktsegment, c_nationkey, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY n DESC, c_nationkey
                   ) AS rn
            FROM c
        )
        SELECT c_mktsegment,
               CAST(c_nationkey AS BIGINT) AS mode_nationkey,
               n                           AS mode_count
        FROM r WHERE rn = 1
    """,
    doc="Mode per group: two-phase count + tie-broken argmax (portable MODE()).",
)
def agg_mode_nation_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rn = F.row_number().over(
        W.partitionBy("c_mktsegment").orderBy(F.desc("n"), F.asc("c_nationkey"))
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").cast("long").alias("mode_nationkey"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "join_null_safe_buckets",
    # null-safe equality (Spark <=>, SQL IS NOT DISTINCT FROM): NULL
    # bucket keys MATCH each other instead of dropping out — the
    # semantics dimension/bridge tables with unknown keys need
    oracle="""
        WITH o AS (
            SELECT NULLIF(o_orderkey % 5, 0) AS bucket,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders
        ),
        dim AS (
            SELECT NULLIF(k, 0) AS bucket,
                   CASE WHEN k = 0 THEN 'unknown' ELSE 'tier_' || k END AS label
            FROM (SELECT unnest(generate_series(0, 4)) AS k)
        )
        SELECT d.label,
               CAST(COUNT(o.cents) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(o.cents), 0) AS BIGINT) AS sum_cents
        FROM dim d JOIN o ON d.bucket IS NOT DISTINCT FROM o.bucket
        GROUP BY 1
    """,
    doc=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL "
        "bucket joins the NULL dimension row instead of vanishing — "
        "still plans as a hash join (null-safe keys are hashable), "
        "unlike general inequality predicates."
    ),
)
def join_null_safe_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.nullif(F.col("o_orderkey") % 5, F.lit(0)).alias("bucket"),
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    dim = spark.range(5).select(
        F.nullif(F.col("id"), F.lit(0)).alias("bucket"),
        F.when(F.col("id") == 0, F.lit("unknown"))
        .otherwise(F.concat(F.lit("tier_"), F.col("id").cast("string")))
        .alias("label"),
    )
    return (
        o.join(F.broadcast(dim), o.bucket.eqNullSafe(dim.bucket))
        .groupBy("label")
        .agg(
            F.count("cents").cast("long").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("sum_cents"),
        )
    )


@register(
    "agg_empty_input_semantics",
    # ANSI aggregate-on-empty-input semantics: a global aggregate over
    # zero rows returns exactly ONE row with COUNT = 0 and null SUM/
    # MIN/MAX — a classic engine-divergence trap (GROUP BY over empty
    # input returns ZERO rows; both shapes are pinned here)
    oracle="""
        WITH none AS (SELECT * FROM orders WHERE o_orderkey < 0)
        SELECT 'global' AS agg_shape,
               CAST(COUNT(*) AS BIGINT)  AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM none
        UNION ALL
        SELECT 'grouped', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(o_orderkey) AS BIGINT),
               CAST(MAX(o_orderkey) AS BIGINT)
        FROM none GROUP BY o_orderstatus
    """,
    doc=(
        "Aggregate-on-empty-input semantics: global agg over zero rows "
        "-> one row (COUNT 0, null SUM/MAX); grouped agg -> zero rows. "
        "Pinned because engines historically diverge here and silent "
        "drift corrupts every downstream COALESCE."
    ),
)
def agg_empty_input_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    none = orders.filter(F.col("o_orderkey") < 0)
    g = none.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    ).select(F.lit("global").alias("agg_shape"), "n_rows", "sum_key", "max_key")
    grp = (
        none.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        .select(
            F.lit("grouped").alias("agg_shape"), "n_rows", "sum_key", "max_key"
        )
    )
    return g.unionAll(grp)


@register(
    "q6_forecast_revenue",
    # TPC-H Q6 shape: map-only filter + one global sum. Revenue =
    # price x discount as an exact integer product (cents x basis
    # points), so the hashed value is engine-exact with no rounding
    # helpers on the surface.
    oracle="""
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n_lines,
            CAST(SUM(
                CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)
            ) AS BIGINT)             AS revenue_cents_bp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape (forecast revenue change): all predicates push "
        "to the scan, zero joins, one global sum — the purest "
        "scan-bandwidth query; revenue as exact cents x basis-points."
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long")
    bp = F.floor(F.col("l_discount") * 100.0 + F.lit(0.5)).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(cents * bp).cast("long").alias("revenue_cents_bp"),
        )
    )


@register(
    "q3_shipping_priority",
    # TPC-H Q3 shape: segment filter -> two joins -> per-order revenue
    # -> top 10 (unique-key tiebreaker). Revenue in exact
    # cents x (100 - bp) integers.
    oracle="""
        SELECT
            l.l_orderkey,
            CAST(SUM(
                CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT))
            ) AS BIGINT)                      AS revenue_units,
            epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS orderdate_us
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY 1, 3
        ORDER BY revenue_units DESC, l.l_orderkey
        LIMIT 10
    """,
    doc=(
        "TPC-H Q3 shape (shipping priority): segment dim broadcast, "
        "order/lineitem equi-joins, per-order revenue rollup, "
        "deterministic top-10 — the classic join-then-rank template."
    ),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("timestamp")
        < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long")
    bp = F.floor(F.col("l_discount") * 100.0 + F.lit(0.5)).cast("long")
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
        )
        .agg(F.sum(cents * (F.lit(100) - bp)).cast("long").alias("revenue_units"))
        .select("l_orderkey", "revenue_units", "orderdate_us")
        .orderBy(F.desc("revenue_units"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — multi-objective dominance filter:
# the parts no other part beats on BOTH objectives (cheaper price,
# larger size). The classic O(n log n) sweep: sort candidate points by
# (price asc, size desc), keep a point iff its size strictly exceeds
# the running max over all strictly-preceding points — equal-(price,
# size) groups dedup first so mutual non-dominance is preserved.
# Scale: the sweep runs over DISTINCT (price, size) points (orders of
# magnitude fewer than rows; the dedup is the only corpus shuffle).
# The single-ordered window over the point set is bounded by the
# distinct-point count; at 100 TB with an unbounded point set the
# two-phase pattern (operators/ranking.py) applies — the running max
# carries per-range partials exactly like the running sum.
# Beyond-reference addition (analytics family).
# ---------------------------------------------------------------------------


@register(
    "skyline_price_size",
    oracle="""
        WITH pts AS (
            SELECT CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)
                       AS price_cents,
                   CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM part GROUP BY 1, 2
        ),
        swept AS (
            SELECT price_cents, p_size, n_parts,
                   MAX(p_size) OVER (
                       ORDER BY price_cents ASC, p_size DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS max_before
            FROM pts
        )
        SELECT price_cents, p_size, n_parts
        FROM swept
        WHERE max_before IS NULL OR p_size > max_before
    """,
    doc=(
        "Skyline / Pareto frontier over (min price, max size): "
        "dominance sweep on deduped points — kept iff size exceeds the "
        "running max over the (price asc, size desc) prefix."
    ),
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dominance sweep's exclusive-prefix running max runs through
    the two-phase operators/ranking.global_running_max_scalable (r10,
    extending r9 verdict task 2): the deduped point set still scales
    with the part table, so a single-partition window over it is the
    banned fact-scale anti-pattern; the two-phase form is
    bit-identical ((price asc, size desc) with the size tiebreak is a
    total order on the deduped points)."""
    from stacktrend_spark.operators.ranking import global_running_max_scalable

    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy(
        F.floor(F.col("p_retailprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    swept = global_running_max_scalable(
        pts,
        order_cols=[F.asc("price_cents"), F.desc("p_size")],
        value_col="p_size",
        max_col="max_before",
        inclusive=False,
    )
    return (
        swept.filter(
            F.col("max_before").isNull() | (F.col("p_size") > F.col("max_before"))
        )
        .select("price_cents", "p_size", "n_parts")
    )


@register(
    "q13_customer_distribution",
    oracle="""
        WITH co AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM co GROUP BY 1
    """,
    doc=(
        "TPC-H Q13 shape: distribution of customers by order count "
        "(left join with an ON-clause predicate so zero-order "
        "customers survive into the c_count=0 bucket), then a count "
        "of counts."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: the ON-clause-filter + COUNT(col) null-skip semantics pin.

    100 TB: one orders-side shuffle for the per-customer count (the
    join keeps customer partitioning via AQE), then a second tiny
    aggregate over #distinct-counts rows. The filter must live in the
    ON clause — a WHERE would turn the left join inner and silently
    drop the zero-order bucket.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    co = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5)
                                     AS BIGINT)))
                       AS total_revenue_scaled
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01'
              AND l_shipdate < DATE '1995-04-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_revenue_scaled AS BIGINT) AS total_revenue_scaled
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue_scaled = (
            SELECT MAX(total_revenue_scaled) FROM revenue
        )
    """,
    doc=(
        "TPC-H Q15 shape: quarterly supplier revenue view, then the "
        "supplier(s) achieving the maximum — the scalar-subquery-on-"
        "aggregate pattern. Revenue in exact scaled integers "
        "(cents × (100−discount%)), so the max is tie-exact."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: the revenue view is one lineitem shuffle to #suppliers
    rows; the max is a broadcast scalar; the final join is
    supplier-dimension sized. Catalyst evaluates the view ONCE when
    expressed as a shared subplan (same DataFrame object on both
    consumers)."""
    from stacktrend_spark.functions.rounding import iscale

    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                iscale("l_extendedprice")
                * (F.lit(100) - iscale("l_discount"))
            ).alias("total_revenue_scaled")
        )
    )
    mx = revenue.agg(
        F.max("total_revenue_scaled").alias("mx")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_scaled") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_scaled").cast("long").alias(
                "total_revenue_scaled"
            ),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY 1
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
        )
        SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
               CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS o_totalprice_cents,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                   AS sum_qty
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY 1, 2, 3, 4, 5
    """,
    doc=(
        "TPC-H Q18 shape: orders whose total line quantity exceeds a "
        "threshold (HAVING subquery → semi join), re-joined to "
        "customer and lineitem for the order detail rollup."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: the HAVING filter reduces lineitem to the (rare) big
    orders FIRST; the IN-subquery plans as a semi join whose right
    side is small enough to broadcast, so the detail re-join touches
    only qualifying orders."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == big.l_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li.withColumnRenamed("l_orderkey", "lk"), F.col("lk") == F.col("o_orderkey"))
        .groupBy(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("o_totalprice_cents"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
    )
