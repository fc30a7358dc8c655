"""ML-governance plans: fairness, conformal calibration, risk binning.

Three audit operators a production ML platform runs next to the
privacy triad (k-anonymity / l-diversity / t-closeness in
plans/statistics.py) before a model or a training set ships:

- ``fairness_demographic_parity`` — per-group positive rate of a
  deterministic decision rule and its parity ratio vs the most-favored
  group, with the EEOC four-fifths flag. The standard disparate-impact
  screen (Feldman et al. 2015, KDD — "Certifying and removing
  disparate impact").
- ``conformal_calibration_quantile`` — split conformal prediction
  (Vovk et al.; Angelopoulos & Bates 2023 tutorial, arXiv:2107.07511):
  the ⌈(n+1)(1−α)⌉-th order statistic of calibration nonconformity
  scores via the two-phase exact-selection spine (no global sort, same
  pattern as ``exact_median_distributed``), then per-group empirical
  coverage on the held-out split.
- ``woe_information_value`` — weight-of-evidence / information-value
  binning (the credit-risk feature screen): per-bin event/non-event
  shares in ppm, WoE in exact µlog10, and the IV contribution per bin.

All hashed surfaces are exact integers (ppm shares, µlog10 via the
decade-interpolated ``xlog10``) so both engines produce bit-identical
values.

Scale shape: every operator reduces the fact table to a BOUNDED frame
(|segments| ≤ 5 rows, a ≤ few-thousand-row bucket histogram, 5 bins)
with map-side-combinable aggregates; scalars broadcast back. The
conformal selection's second pass scans only the target bucket's rows
(predicate reaches the scan). No unbounded window, no driver loop.

Reference anchor: the reference pipeline ships classifier outputs with
no governance stage (classifier thresholds only,
data_transformation.py dt:221-268); this layer is additive capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stacktrend_spark.functions.rounding import sql_xlog10, xlog10
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

_POS_THRESHOLD = 150000.0   # decision rule: o_totalprice >= this
_CONF_ALPHA_NUM = 9         # 1 - alpha = 9/10
_CONF_BUCKET = 65536        # coarse histogram bucket width (cents)
_CONF_CUTOFF = "1997-01-01"  # calibration = orders strictly before
_WOE_BINS = 5


def _ilog(col: Column) -> Column:
    return F.floor(xlog10(F.greatest(col, F.lit(1))) * F.lit(1000000.0)).cast("long")


def _sql_ilog(expr: str) -> str:
    return f"CAST(FLOOR({sql_xlog10(f'GREATEST({expr}, 1)')} * 1000000.0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Demographic parity / disparate impact.
# ---------------------------------------------------------------------------
@register(
    "fairness_demographic_parity",
    oracle=f"""
        WITH scored AS (
            SELECT c.c_mktsegment AS segment,
                   CASE WHEN o.o_totalprice >= {_POS_THRESHOLD} THEN 1 ELSE 0 END AS pos
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        rates AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT)                    AS n,
                   CAST(SUM(pos) AS BIGINT)                    AS n_pos,
                   CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm
            FROM scored GROUP BY 1
        ),
        best AS (SELECT MAX(pos_rate_ppm) AS max_rate FROM rates)
        SELECT segment, n, n_pos, pos_rate_ppm,
               CAST(pos_rate_ppm * 1000000 // best.max_rate AS BIGINT)
                   AS parity_ratio_ppm,
               pos_rate_ppm * 1000000 // best.max_rate >= 800000
                   AS four_fifths_ok
        FROM rates CROSS JOIN best
    """,
    doc=(
        "Disparate-impact screen: per-segment positive rate of the "
        "price>=150k rule in exact ppm, parity ratio vs the most-"
        "favored segment, EEOC four-fifths flag."
    ),
)
def fairness_demographic_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    scored = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_totalprice") >= _POS_THRESHOLD, 1).otherwise(0).alias("pos"),
    )
    rates = scored.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.expr("CAST(SUM(pos) * 1000000 DIV COUNT(*) AS BIGINT)").alias(
            "pos_rate_ppm"
        ),
    )
    best = rates.agg(F.max("pos_rate_ppm").alias("max_rate"))
    return (
        rates.join(F.broadcast(best))
        .select(
            "segment",
            "n",
            "n_pos",
            "pos_rate_ppm",
            # r13 degenerate-corpus fix: when NO segment has a single
            # positive (max_rate = 0) ANSI Spark crashed on the parity
            # division where DuckDB yields NULL ratio and NULL flag
            # (parity vs a zero-rate best is undefined)
            F.expr(
                "CASE WHEN max_rate = 0 THEN NULL"
                " ELSE CAST(pos_rate_ppm * 1000000 DIV max_rate AS BIGINT)"
                " END"
            ).alias("parity_ratio_ppm"),
            F.expr(
                "CASE WHEN max_rate = 0 THEN NULL"
                " ELSE pos_rate_ppm * 1000000 DIV max_rate >= 800000 END"
            ).alias("four_fifths_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Split conformal prediction: q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
# calibration nonconformity score (score = |price − segment mean| in
# exact cents), found by the two-phase selection spine; coverage on
# the temporal holdout should concentrate near 1−α = 90%.
# ---------------------------------------------------------------------------
@register(
    "conformal_calibration_quantile",
    oracle=f"""
        WITH base AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
                   o.o_orderdate < DATE '{_CONF_CUTOFF}' AS is_cal
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        segmean AS (
            SELECT segment,
                   CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents
            FROM base WHERE is_cal GROUP BY 1
        ),
        scores AS (
            SELECT b.segment, b.is_cal, ABS(b.cents - m.mean_cents) AS s
            FROM base b JOIN segmean m USING (segment)
        ),
        n AS (
            SELECT COUNT(*) AS n_cal,
                   (COUNT(*) + 1) * {_CONF_ALPHA_NUM} // 10 AS r
            FROM scores WHERE is_cal
        ),
        coarse AS (
            SELECT s // {_CONF_BUCKET} AS b, COUNT(*) AS c
            FROM scores WHERE is_cal GROUP BY 1
        ),
        cum AS (
            SELECT b, c, SUM(c) OVER (ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
            FROM coarse
        ),
        target AS (SELECT MIN(b) AS tb FROM cum, n WHERE cum_c >= n.r),
        before AS (
            SELECT COALESCE(SUM(c), 0) AS cnt_before
            FROM coarse, target WHERE b < target.tb
        ),
        fine AS (
            SELECT s, COUNT(*) AS c FROM scores, target
            WHERE is_cal AND s // {_CONF_BUCKET} = target.tb GROUP BY 1
        ),
        fcum AS (
            SELECT s, SUM(c) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
            FROM fine
        ),
        qhat AS (
            SELECT MIN(s) AS qhat_cents FROM fcum, before, n
            WHERE fcum.cum_c >= n.r - before.cnt_before
        )
        SELECT s.segment,
               CAST(COUNT(*) AS BIGINT)                                AS n_eval,
               CAST(SUM(CASE WHEN s.s <= q.qhat_cents THEN 1 ELSE 0 END) AS BIGINT)
                                                                       AS n_covered,
               CAST(SUM(CASE WHEN s.s <= q.qhat_cents THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT)                   AS coverage_ppm,
               CAST(q.qhat_cents AS BIGINT)                            AS qhat_cents
        FROM scores s CROSS JOIN qhat q
        WHERE NOT s.is_cal
        GROUP BY s.segment, q.qhat_cents
    """,
    doc=(
        "Split conformal prediction: exact ceil((n+1)(1-alpha)) order "
        "statistic of calibration |price - segment mean| scores via "
        "two-phase selection (no global sort), per-segment coverage "
        "on the temporal holdout in ppm."
    ),
)
def conformal_calibration_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: the calibration corpus reduces to a ≤ #buckets-row
    histogram (map-side combinable); pass 2 scans only the target
    bucket. The eval side is one broadcast scalar join + a |segments|
    aggregate. Same selection spine as exact_median_distributed
    (statistics.py:988) generalized to an arbitrary rank."""
    from stacktrend_spark.functions.rounding import iscale

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        iscale("o_totalprice").alias("cents"),
        (F.col("o_orderdate") < F.lit(_CONF_CUTOFF).cast("date")).alias("is_cal"),
    )
    segmean = (
        base.filter("is_cal")
        .groupBy("segment")
        .agg(F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("mean_cents"))
    )
    scores = base.join(F.broadcast(segmean), "segment").select(
        "segment", "is_cal", F.abs(F.col("cents") - F.col("mean_cents")).alias("s")
    )
    cal = scores.filter("is_cal")
    n = cal.agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.expr(f"(COUNT(*) + 1) * {_CONF_ALPHA_NUM} DIV 10").alias("r"),
    )
    coarse = cal.groupBy(F.expr(f"s DIV {_CONF_BUCKET}").alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # bounded spine (#buckets rows): single-partition window by construction
    cum = coarse.withColumn(
        "cum_c", F.sum("c").over(W.orderBy("b").rowsBetween(W.unboundedPreceding, 0))
    )
    target = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cum_c") >= F.col("r"))
        .agg(F.min("b").alias("tb"))
    )
    before = (
        coarse.crossJoin(F.broadcast(target))
        .filter(F.col("b") < F.col("tb"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("cnt_before"))
    )
    fine = (
        cal.crossJoin(F.broadcast(target))
        .filter(F.expr(f"s DIV {_CONF_BUCKET}") == F.col("tb"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fcum = fine.withColumn(
        "cum_c", F.sum("c").over(W.orderBy("s").rowsBetween(W.unboundedPreceding, 0))
    )
    qhat = (
        fcum.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(before))
        .filter(F.col("cum_c") >= F.col("r") - F.col("cnt_before"))
        .agg(F.min("s").alias("qhat_cents"))
    )
    return (
        scores.filter(~F.col("is_cal"))
        .crossJoin(F.broadcast(qhat))
        .groupBy("segment", "qhat_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(F.when(F.col("s") <= F.col("qhat_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
            F.expr(
                "CAST(SUM(CASE WHEN s <= qhat_cents THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .select(
            "segment",
            "n_eval",
            "n_covered",
            "coverage_ppm",
            F.col("qhat_cents").cast("long").alias("qhat_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Weight of evidence / information value. Bins: fixed-width quantity
# bins (no quantile pass needed — quantity is 1..50); event =
# l_returnflag = 'R'. Laplace +1 on both shares keeps WoE finite on
# empty cells; shares ppm-quantized, WoE exact µlog10, IV contribution
# = (share_e − share_ne) · WoE in µ² units scaled back to µ.
# ---------------------------------------------------------------------------
@register(
    "woe_information_value",
    oracle=f"""
        WITH rows_ AS (
            SELECT LEAST(CAST(l_quantity AS BIGINT) // 10, {_WOE_BINS - 1}) AS bin,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS e
            FROM lineitem
        ),
        tot AS (
            SELECT SUM(e) AS tot_e, COUNT(*) - SUM(e) AS tot_ne FROM rows_
        ),
        cells AS (
            SELECT bin,
                   CAST(COUNT(*) AS BIGINT)           AS n,
                   CAST(SUM(e) AS BIGINT)             AS n_event,
                   CAST(COUNT(*) - SUM(e) AS BIGINT)  AS n_nonevent
            FROM rows_ GROUP BY 1
        ),
        shared AS (
            SELECT bin, n, n_event, n_nonevent,
                   CAST((n_event + 1) * 1000000 // (tot.tot_e + {_WOE_BINS}) AS BIGINT)
                       AS share_e_ppm,
                   CAST((n_nonevent + 1) * 1000000 // (tot.tot_ne + {_WOE_BINS}) AS BIGINT)
                       AS share_ne_ppm
            FROM cells CROSS JOIN tot
        )
        SELECT bin, n, n_event, n_nonevent, share_e_ppm, share_ne_ppm,
               CAST({_sql_ilog('share_e_ppm')} - {_sql_ilog('share_ne_ppm')} AS BIGINT)
                   AS woe_micro,
               CAST((share_e_ppm - share_ne_ppm)
                    * ({_sql_ilog('share_e_ppm')} - {_sql_ilog('share_ne_ppm')})
                    // 1000000 AS BIGINT)
                   AS iv_contrib_micro
        FROM shared
    """,
    doc=(
        "Weight-of-evidence / information-value screen: quantity bins "
        "x returnflag event, Laplace ppm shares, WoE in exact µlog10, "
        "per-bin IV contribution — the credit-risk feature audit."
    ),
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(f"LEAST(CAST(l_quantity AS BIGINT) DIV 10, {_WOE_BINS - 1})").alias(
            "bin"
        ),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("e"),
    )
    tot = li.agg(
        F.sum("e").alias("tot_e"),
        (F.count(F.lit(1)) - F.sum("e")).alias("tot_ne"),
    )
    cells = li.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("e").cast("long").alias("n_event"),
        (F.count(F.lit(1)) - F.sum("e")).cast("long").alias("n_nonevent"),
    )
    shared = cells.join(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_event",
        "n_nonevent",
        F.expr(
            f"CAST((n_event + 1) * 1000000 DIV (tot_e + {_WOE_BINS}) AS BIGINT)"
        ).alias("share_e_ppm"),
        F.expr(
            f"CAST((n_nonevent + 1) * 1000000 DIV (tot_ne + {_WOE_BINS}) AS BIGINT)"
        ).alias("share_ne_ppm"),
    )
    scored = shared.withColumn(
        "woe_micro",
        (_ilog(F.col("share_e_ppm")) - _ilog(F.col("share_ne_ppm"))).cast("long"),
    )
    return scored.select(
        "bin",
        "n",
        "n_event",
        "n_nonevent",
        "share_e_ppm",
        "share_ne_ppm",
        "woe_micro",
        F.expr(
            "CAST((share_e_ppm - share_ne_ppm) * woe_micro DIV 1000000 AS BIGINT)"
        ).alias("iv_contrib_micro"),
    )
