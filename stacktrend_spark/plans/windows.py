"""Window functions, sorts/limits, top-k (SURVEY §2.5, §2.6).

Implements the reference's window surface — global ranking (W1),
partitioned ranking (W2), share-of-total windowed sums (W3/W4) — AND
the time-lag comparisons the reference stubbed with lit(0)
(silver_to_gold_analytics.py:423-424 "Placeholder for historical
comparison") implemented for real with lag() (W5), plus running sums
with explicit frames and gap-based sessionization (beyond-reference).

Scale notes: W1-style single-partition global windows are fine at
dimension cardinality (suppliers, nations) but would serialize at fact
cardinality — every query here that ranks globally does so AFTER a
grouping/filter step has reduced cardinality, which is the pattern that
survives 100×. Every orderBy carries a unique-key tiebreaker so results
are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import (
    dsum,
    fround,
    iscale,
    sql_dsum,
    sql_iscale,
    sql_round,
)
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# W1 — global ranking (row_number over a whole frame,
# silver_to_gold_analytics.py:225-236). Rank suppliers by balance.
# ---------------------------------------------------------------------------
@register(
    "window_rank_global",
    oracle="""
        SELECT
            s_suppkey,
            s_name,
            s_acctbal,
            CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS balance_rank,
            CAST(RANK()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS balance_rank_dense_input,
            CAST(NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS balance_quartile
        FROM supplier
        QUALIFY balance_rank <= 50
    """,
    doc="Global row_number/rank/ntile ranking (W1) with unique tiebreaker; top-50 (O2).",
)
def window_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.row_number().over(w).cast("long").alias("balance_rank"),
            F.rank().over(w).cast("long").alias("balance_rank_dense_input"),
            F.ntile(4).over(w).cast("long").alias("balance_quartile"),
        )
        .filter(F.col("balance_rank") <= 50)
    )


# ---------------------------------------------------------------------------
# W2 — partitioned ranking (quality rank within technology category,
# silver_to_gold_analytics.py:364-366): top-3 parts per brand by price.
# ---------------------------------------------------------------------------
@register(
    "window_rank_in_group",
    oracle="""
        SELECT
            p_brand,
            p_partkey,
            p_retailprice,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank
        FROM part
        QUALIFY price_rank <= 3
    """,
    doc="Partitioned top-k per group (W2 + O2): parallel across groups, no global sort.",
)
def window_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


# ---------------------------------------------------------------------------
# W3 — share-of-total via windowed sum (market share over partition_date,
# silver_to_gold_analytics.py:421-422): nation revenue share of region.
# Exact arithmetic: shares are ratios of exact integer sums.
# ---------------------------------------------------------------------------
@register(
    "window_share_of_region",
    oracle=f"""
        WITH nat AS (
            SELECT
                r.r_name AS region,
                n.n_name AS nation,
                SUM({sql_iscale('o.o_totalprice')}) AS irev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
        )
        SELECT
            region,
            nation,
            CAST(irev AS DOUBLE) / 100.0 AS revenue,
            {sql_round('CAST(irev AS DOUBLE) / CAST(SUM(irev) OVER (PARTITION BY region) AS DOUBLE)', 6)} AS region_share
        FROM nat
    """,
    doc="Windowed sum share-of-total (W3): agg first, window over the reduced rollup.",
)
def window_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(iscale("o_totalprice")).alias("irev"))
    )
    w = W.partitionBy("region")
    return nat.select(
        "region",
        "nation",
        (F.col("irev").cast("double") / 100.0).alias("revenue"),
        fround(
            F.col("irev").cast("double") / F.sum("irev").over(w).cast("double"), 6
        ).alias("region_share"),
    )


# ---------------------------------------------------------------------------
# W4 — whole-frame windowed sum (star % of grand total, empty
# partitionBy, silver_to_gold_analytics.py:525-526): segment share of
# global revenue (the lang_stats shape).
# ---------------------------------------------------------------------------
@register(
    "window_share_global",
    oracle=f"""
        WITH seg AS (
            SELECT
                c.c_mktsegment AS mktsegment,
                CAST(COUNT(*) AS BIGINT) AS n_orders,
                SUM({sql_iscale('o.o_totalprice')}) AS irev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        )
        SELECT
            mktsegment,
            n_orders,
            CAST(irev AS DOUBLE) / 100.0 AS revenue,
            {sql_round('CAST(irev AS DOUBLE) / CAST(SUM(irev) OVER () AS DOUBLE)', 6)} AS global_share,
            CAST(ROW_NUMBER() OVER (ORDER BY irev DESC, mktsegment) AS BIGINT) AS revenue_rank
        FROM seg
    """,
    doc="Global-frame windowed sum (W4) + rank: the lang_stats composition.",
)
def window_share_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(iscale("o_totalprice")).alias("irev"),
        )
    )
    w_all = W.partitionBy()
    w_rank = W.orderBy(F.desc("irev"), F.asc("mktsegment"))
    return seg.select(
        "mktsegment",
        "n_orders",
        (F.col("irev").cast("double") / 100.0).alias("revenue"),
        fround(
            F.col("irev").cast("double") / F.sum("irev").over(w_all).cast("double"), 6
        ).alias("global_share"),
        F.row_number().over(w_rank).cast("long").alias("revenue_rank"),
    )


# ---------------------------------------------------------------------------
# W5 — time-lag comparison, REAL (the reference hard-codes
# momentum_change = lit(0.0) at silver_to_gold_analytics.py:423-424;
# we implement lag for real): monthly revenue with previous-period
# delta and momentum ratio.
# ---------------------------------------------------------------------------
@register(
    "window_lag_monthly_trend",
    oracle=f"""
        WITH daily AS (
            SELECT
                DATE_TRUNC('month', o_orderdate) AS month,
                o_orderpriority                  AS priority,
                CAST(COUNT(*) AS BIGINT)         AS n_orders,
                SUM({sql_iscale('o_totalprice')}) AS irev
            FROM orders
            GROUP BY 1, 2
        )
        SELECT
            month,
            priority,
            n_orders,
            CAST(irev AS DOUBLE) / 100.0 AS revenue,
            CAST(COALESCE(irev - LAG(irev) OVER (PARTITION BY priority ORDER BY month), 0)
                 AS DOUBLE) / 100.0 AS revenue_change,
            {sql_round("CAST(irev AS DOUBLE) / CAST(NULLIF(LAG(irev) OVER (PARTITION BY priority ORDER BY month), 0) AS DOUBLE)", 6)} AS momentum_ratio
        FROM daily
    """,
    doc="lag()-based period-over-period change (W5) — implemented for real, not stubbed.",
)
def window_lag_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(iscale("o_totalprice")).alias("irev"),
        )
    )
    w = W.partitionBy("priority").orderBy("month")
    prev = F.lag("irev").over(w)
    return monthly.select(
        "month",
        "priority",
        "n_orders",
        (F.col("irev").cast("double") / 100.0).alias("revenue"),
        (
            F.coalesce(F.col("irev") - prev, F.lit(0)).cast("double") / 100.0
        ).alias("revenue_change"),
        fround(
            F.col("irev").cast("double")
            / F.nullif(prev, F.lit(0)).cast("double"),
            6,
        ).alias("momentum_ratio"),
    )


# ---------------------------------------------------------------------------
# Explicit frame spec (beyond the reference's default frames): running
# revenue per customer, ROWS UNBOUNDED PRECEDING → CURRENT ROW.
# Exact integer cumsum → deterministic across engines.
# ---------------------------------------------------------------------------
@register(
    "window_running_total",
    oracle=f"""
        SELECT
            o_custkey,
            o_orderkey,
            o_orderdate,
            CAST(SUM({sql_iscale('o_totalprice')}) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) / 100.0 AS running_revenue,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
        FROM orders
        WHERE o_custkey < 100
    """,
    doc="Explicit ROWS frame running sum — absent from the reference, standard Spark.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(iscale("o_totalprice"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            / 100.0
        ).alias("running_revenue"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# O1/O2 — global top-k (sort + limit) with deterministic tiebreaker.
# ---------------------------------------------------------------------------
@register(
    "topk_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="Global top-k (O1+O2): Spark TakeOrderedAndProject — no full sort materialized.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Sessionization (beyond-reference, SURVEY §2.10): gap-based sessions
# over the events table — lag + cumulative-sum-of-gap-flags, the batch
# twin of streaming session_window. Exact µs arithmetic end to end.
# ---------------------------------------------------------------------------
_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "sessionize_events",
    oracle=f"""
        WITH seq AS (
            SELECT
                user_id,
                event_id,
                epoch_us(ts) AS ts_us,
                CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_US}
                     OR LAG(epoch_us(ts)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS is_new_session
            FROM events
        ),
        sess AS (
            SELECT
                user_id,
                event_id,
                ts_us,
                SUM(is_new_session) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM seq
        )
        SELECT
            user_id,
            CAST(session_seq AS BIGINT)            AS session_seq,
            CAST(COUNT(*) AS BIGINT)               AS n_events,
            CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
        FROM sess
        GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (lag + running sum), batch twin of session_window.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(ts_us).over(w)
    seq = events.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.when(prev_us.isNull() | ((ts_us - prev_us) > _GAP_US), 1)
        .otherwise(0)
        .alias("is_new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sess = seq.withColumn("session_seq", F.sum("is_new_session").over(w2))
    return sess.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# W1 at scale — the two-phase global ranking that replaces the
# single-partition window (operators/ranking.py). Same result as
# window_rank_global's row_number, produced without funneling the table
# through one task.
# ---------------------------------------------------------------------------
@register(
    "rank_global_scalable",
    oracle="""
        SELECT
            o_orderkey,
            o_totalprice,
            CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
                AS price_rank
        FROM orders
        QUALIFY price_rank <= 100
    """,
    doc="Two-phase distributed global rank (range partition + local rank + offsets); top-100.",
)
def rank_global_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.operators.ranking import global_rank_scalable

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_rank_scalable(
        orders,
        order_cols=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        rank_col="price_rank",
    )
    return ranked.filter(F.col("price_rank") <= 100).select(
        "o_orderkey", "o_totalprice", "price_rank"
    )


# ---------------------------------------------------------------------------
# Explicit RANGE frame — a value-based sliding window (trailing 2 days
# per user), the frame class the reference never narrows (§2.5 note).
# Frames run on epoch-µs longs so both engines bound the range
# identically.
# ---------------------------------------------------------------------------
@register(
    "window_range_frame_trailing",
    oracle="""
        SELECT
            event_id,
            user_id,
            epoch_us(ts) AS ts_us,
            CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_2d,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT)
                AS sum_cents_trailing_2d
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW
        )
    """,
    doc="RANGE interval frame: trailing-2-day per-user count/sum on an epoch-µs axis.",
)
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.rounding import iscale

    ev = load_table(spark, sf_dir, "events")
    two_days_us = 2 * 86_400_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-two_days_us, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing_2d"),
        F.sum(iscale("value", 2)).over(w).cast("long").alias("sum_cents_trailing_2d"),
    )


# ---------------------------------------------------------------------------
# Distribution window functions — percent_rank / cume_dist / nth_value
# (beyond the reference's rank/share surface). percent_rank and
# cume_dist are exact rationals ((rank-1)/(n-1), peers/n) computed by
# one correctly-rounded division on exact integers, so they hash
# bit-identically without rounding; the ordering carries a unique
# o_orderkey tiebreaker so nth_value's default running frame selects
# the same row in both engines.
# ---------------------------------------------------------------------------
@register(
    "window_first_last",
    # last_value needs the FULL frame: the default running frame makes
    # it the current row — a classic window-semantics trap, pinned here
    # identically in both engines.
    oracle="""
        SELECT
            o_orderkey,
            o_orderpriority,
            FIRST_VALUE(o_orderkey) OVER w AS best_key,
            LAST_VALUE(o_orderkey)  OVER w AS worst_key
        FROM orders
        WHERE o_orderkey <= 2000
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                     o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    doc="first_value/last_value over the full partition frame (explicit ROWS frame).",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.rounding import iscale

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.desc(iscale("o_totalprice")), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_orderkey").over(w).alias("best_key"),
        F.last("o_orderkey").over(w).alias("worst_key"),
    )


@register(
    "window_rank_distribution",
    oracle="""
        SELECT
            o_orderkey,
            o_orderpriority,
            PERCENT_RANK() OVER w AS pct_rank,
            CUME_DIST()    OVER w AS cume,
            NTH_VALUE(o_orderkey, 3) OVER w AS third_key
        FROM orders
        WHERE o_orderkey <= 2000
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC, o_orderkey
        )
    """,
    doc="percent_rank/cume_dist/nth_value per priority — exact-rational distribution stats.",
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.rounding import iscale

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc(iscale("o_totalprice")), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@register(
    "window_running_distinct_users",
    oracle="""
        WITH days AS (
            SELECT user_id,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_no
            FROM events
        ),
        first_seen AS (
            SELECT user_id, MIN(day_no) AS d0 FROM days GROUP BY 1
        ),
        daily AS (
            SELECT d.day_no,
                   CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_active,
                   CAST(COUNT(DISTINCT CASE WHEN f.d0 = d.day_no
                                            THEN d.user_id END) AS BIGINT)
                       AS n_new
            FROM days d JOIN first_seen f USING (user_id)
            GROUP BY 1
        )
        SELECT day_no, n_active, n_new,
               CAST(SUM(n_new) OVER (
                   ORDER BY day_no ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS distinct_users_to_date
        FROM daily
    """,
    doc=(
        "Running DISTINCT-user count: COUNT(DISTINCT) OVER is "
        "unsupported (and unscalable — per-frame dedup state); the "
        "scalable rewrite attributes each user to their FIRST-seen day "
        "and running-sums the first-seen counts. State per day = one "
        "integer; the window runs over the tiny daily aggregate."
    ),
)
def window_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_no")
    )
    # two independent aggregates, joined on the CALENDAR key (bounded
    # by days, broadcastable at any data scale) — never a join on
    # user_id, whose cardinality grows with the data:
    active = days.groupBy("day_no").agg(
        F.count_distinct("user_id").cast("long").alias("n_active")
    )
    new_per_day = (
        days.groupBy("user_id")
        .agg(F.min("day_no").alias("day_no"))
        .groupBy("day_no")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    daily = active.join(F.broadcast(new_per_day), "day_no", "left").select(
        "day_no",
        "n_active",
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    # the running sum is over the DAILY aggregate (dozens of rows) —
    # a single-partition window here is bounded by calendar days, not
    # data volume; it never touches event-level rows
    w = W.orderBy("day_no").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        F.col("day_no").cast("long").alias("day_no"),
        "n_active",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("distinct_users_to_date"),
    )


# ---------------------------------------------------------------------------
# Native session_window batch aggregation (r7) — sessionize_events
# above is the lag+running-sum ISLAND formulation; this is Spark's
# NATIVE gap-session operator (F.session_window in a batch groupBy):
# one SessionWindow aggregate node, no window-function pass, merge
# semantics handled by the engine. Same 30-min gap; the oracle rebuilds
# the identical sessions with the island SQL (session end = last event
# + gap, per session_window's contract).
# 100 TB: ONE shuffle on user_id into a sort-merge session aggregate —
# strictly fewer passes than the two-window island plan; the state per
# group is the open session, not the user's history.
# ---------------------------------------------------------------------------
@register(
    "session_window_native_batch",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id,
                   epoch_us(ts) AS ts_us,
                   CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            > {_GAP_US}
                        OR LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        islands AS (
            SELECT user_id, ts_us, cents,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
            FROM seq
        )
        SELECT user_id,
               CAST(MIN(ts_us) AS BIGINT)              AS session_start_us,
               CAST(MAX(ts_us) + {_GAP_US} AS BIGINT)  AS session_end_us,
               CAST(COUNT(*) AS BIGINT)                AS n_events,
               CAST(SUM(cents) AS BIGINT)              AS sum_cents
        FROM islands
        GROUP BY user_id, sid
    """,
    doc=(
        "NATIVE gap-session aggregation (F.session_window, 30-min "
        "gap): one SessionWindow aggregate node instead of the "
        "two-window island plan; session end = last event + gap."
    ),
)
def session_window_native_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("win")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(iscale("value")).cast("long").alias("sum_cents"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            F.unix_micros(F.col("win.end")).alias("session_end_us"),
            "n_events",
            "sum_cents",
        )
    )
