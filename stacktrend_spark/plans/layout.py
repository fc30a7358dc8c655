"""Physical-layout queries: bucketed co-located joins and
hive-partitioned reads with partition pruning.

These register the engine's two layout operators (operators/bucketing,
plus the hive-style partitioned write/read below) as oracle-checked
queries, so the driver hash-proves not just the plan SHAPE (pinned in
tests/test_plans.py) but the results the layouts produce.

100 TB notes:

- **Bucketing** pays the fact-table shuffle once at write time; every
  later equi-join on the bucket key plans with ZERO Exchange — at
  1000 executors that is the difference between a nightly job and an
  hourly one. The query below joins two same-bucketed tables and the
  companion plan test asserts the exchange-free shape.
- **Partition pruning** is the scan-side twin: a hive-partitioned
  layout turns a predicate on the partition column into directory
  listing, so a 100 TB table with 5 000 daily partitions reads only
  the day it needs. The companion plan test asserts the filter lands
  in PartitionFilters (metadata), not PushedFilters (data).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.fsutil import tmpdir as _tmpdir
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

#: bucket count for the co-located join demo (matches both sides)
_N_BUCKETS = 8


@register(
    "bucketed_join_colocated",
    oracle="""
        SELECT
            o.o_orderpriority                 AS priority,
            CAST(COUNT(*) AS BIGINT)          AS n_lines,
            CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                 AS BIGINT)                   AS sum_price_cents
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY 1
    """,
    doc=(
        f"Co-located join over two tables bucketed {_N_BUCKETS}-way on "
        "the join key: the write pays the shuffle once, the join plans "
        "with zero Exchange (plan shape pinned in tests/test_plans.py)."
    ),
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bucketed_join_frame(spark, sf_dir)


def _bucketed_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by the registered query and the plan-shape test."""
    from stacktrend_spark.operators.bucketing import bucketed_join, write_bucketed

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    write_bucketed(orders, "b_colocated_orders", ["o_orderkey"], _N_BUCKETS)
    write_bucketed(li, "b_colocated_lineitem", ["o_orderkey"], _N_BUCKETS)
    joined = bucketed_join(
        spark, "b_colocated_orders", "b_colocated_lineitem", ["o_orderkey"]
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_price_cents"),
    )


@register(
    "source_partition_pruning",
    oracle="""
        SELECT
            CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_no,
            CAST(COUNT(*) AS BIGINT)                    AS n_events,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                                                        AS sum_value_cents
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    doc=(
        "Hive-partitioned write (partitionBy event_type) + pruned read: "
        "the event_type predicate resolves at directory-listing time "
        "(PartitionFilters), so only 1 of 5 partitions is scanned — "
        "plan shape pinned in tests/test_plans.py."
    ),
)
def source_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pruned_read_frame(spark, sf_dir)


#: fixture cache: sf_dir → hive-partitioned events dir. Same pattern
#: as _DPP_FIXTURES (r8 verdict task 4): the partitioned table is a
#: write-once INPUT — the measured operator is the PRUNED READ, so
#: rebuilding it per invocation both leaked mkdtemp copies and folded
#: a full write into every "warm" bench sample. atexit-cleaned.
_HIVEPART_FIXTURES: dict[str, str] = {}


def _hivepart_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    cached = _HIVEPART_FIXTURES.get(sf_dir)
    if cached is not None:
        return cached
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    base = _tmpdir("stacktrend_hivepart_")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    _HIVEPART_FIXTURES[sf_dir] = base
    return base


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Parquet read with an empty-fixture fallback (r13 empty-corpus
    audit): a partitioned write of ZERO rows leaves a fileless dir and
    schema inference raises UNABLE_TO_INFER_SCHEMA. The inference path
    stays bit-identical whenever files exist (hive partition types
    keep their inferred forms — load-bearing for the DPP rule match);
    only the empty edge takes the explicit-schema fallback."""
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.read.schema(schema).parquet(path)


def _pruned_read_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by the registered query and the plan-shape test."""
    base = _hivepart_fixture_dir(spark, sf_dir)
    pruned = _read_or_empty(
        spark,
        base,
        "event_id long, ts timestamp, value double, event_type string",
    ).filter(F.col("event_type") == "purchase")
    return pruned.groupBy(
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day_no")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
    )


_ZM_FILE_ROWS = 1000  # orderkeys per simulated file


@register(
    "zonemap_skipping_audit",
    oracle=f"""
        WITH zoned AS (
            SELECT l_orderkey // {_ZM_FILE_ROWS} AS file_id,
                   l_shipdate,
                   date_trunc('month', l_shipdate) AS m
            FROM lineitem
        ),
        zones AS (
            SELECT file_id,
                   MIN(l_shipdate) AS zmin,
                   MAX(l_shipdate) AS zmax,
                   COUNT(*) AS n_rows
            FROM zoned GROUP BY 1
        ),
        months AS (SELECT DISTINCT m FROM zoned),
        audit AS (
            SELECT months.m,
                   COUNT(*) AS n_files,
                   SUM(CASE WHEN zones.zmax <  months.m
                             OR zones.zmin >= months.m + INTERVAL 1 MONTH
                            THEN 1 ELSE 0 END) AS n_skipped,
                   SUM(CASE WHEN zones.zmax <  months.m
                             OR zones.zmin >= months.m + INTERVAL 1 MONTH
                            THEN zones.n_rows ELSE 0 END) AS rows_skipped,
                   SUM(zones.n_rows) AS rows_total
            FROM months CROSS JOIN zones
            GROUP BY 1
        )
        SELECT CAST(epoch_us(CAST(m AS TIMESTAMP)) AS BIGINT) AS month_us,
               CAST(n_files AS BIGINT) AS n_files,
               CAST(n_skipped AS BIGINT) AS n_skipped,
               CAST(n_skipped * 1000000 // n_files AS BIGINT)
                   AS skip_ratio_ppm,
               CAST(rows_skipped AS BIGINT) AS rows_skipped,
               CAST(rows_total AS BIGINT) AS rows_total
        FROM audit
    """,
    doc=(
        "Zone-map (min/max statistics) skipping audit: rows bucket "
        "into simulated files by orderkey range, each file keeps "
        "min/max shipdate, and for every month-range predicate the "
        "audit reports how many files (and rows) the zone maps would "
        "skip — the data-layout health check behind clustering/"
        "Z-order decisions."
    ),
)
def zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why layout matters, quantified.

    100 TB: zones aggregate is one shuffle to #files rows; the
    month × zones audit is a broadcast cross of #months × #files
    zone STATS (never data). A low skip ratio on a hot predicate
    column is the signal to re-cluster (zorder_layout_stats shows the
    re-layout side of this coin).

    r12: the month is emitted as EPOCH-µS (the repo's cross-engine
    convention) — this was the registry's ONLY row emitting a raw
    DATE column (389-query schema sweep), and a bare driver session
    (no Arrow) materializes DateType to object-dtype python dates,
    which the comparator canon does not coerce: the row failed
    strict_bare_verify while passing the Arrow-enabled local gate.
    Internal date comparisons are unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(f"l_orderkey DIV {_ZM_FILE_ROWS}").alias("file_id"),
        "l_shipdate",
        F.date_trunc("month", "l_shipdate").cast("date").alias("m"),
    )
    zones = li.groupBy("file_id").agg(
        F.min("l_shipdate").alias("zmin"),
        F.max("l_shipdate").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    months = li.select("m").distinct()
    skipped = F.when(
        (F.col("zmax") < F.col("m"))
        | (F.col("zmin") >= F.add_months(F.col("m"), 1)),
        1,
    ).otherwise(0)
    return (
        months.crossJoin(F.broadcast(zones))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(skipped).alias("n_skipped"),
            F.sum(skipped * F.col("n_rows")).alias("rows_skipped"),
            F.sum("n_rows").alias("rows_total"),
        )
        .select(
            F.unix_micros(F.col("m").cast("timestamp")).alias("month_us"),
            F.col("n_files").cast("long").alias("n_files"),
            F.col("n_skipped").cast("long").alias("n_skipped"),
            F.expr("n_skipped * 1000000 DIV n_files")
            .cast("long")
            .alias("skip_ratio_ppm"),
            F.col("rows_skipped").cast("long").alias("rows_skipped"),
            F.col("rows_total").cast("long").alias("rows_total"),
        )
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation audit (r6) — the optimizer-engineering
# query: how good is the uniform-frequency assumption that every
# cost-based optimizer (Catalyst included) uses to size a join? For
# the lineitem⋈lineitem self-join on partkey:
#
#   exact      = Σ_k c(k)²                       (true join size)
#   est_global = n² DIV ndv                      (one uniform bucket)
#   est_b100   = Σ_b n_b² DIV ndv_b              (100-key histogram buckets)
#
# All exact integers (c ≤ 10⁶ → c² ≤ 10¹²; the global n² runs through
# DECIMAL(38,0)/HUGEINT); error columns in ppm. The bucketed estimate
# converging toward exact IS the argument for histogram statistics in
# a catalog.
# 100 TB: one per-key count aggregate (map-side combined) feeds all
# three numbers — the audit never materializes the join itself.
# ---------------------------------------------------------------------------
@register(
    "join_cardinality_estimate",
    oracle="""
        WITH ck AS (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        ex AS (
            SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS exact_pairs,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS ndv
            FROM ck
        ),
        bk AS (
            SELECT l_partkey // 100 AS b,
                   CAST(SUM(c) AS BIGINT) AS nb,
                   CAST(COUNT(*) AS BIGINT) AS ndvb
            FROM ck GROUP BY 1
        ),
        eb AS (
            SELECT CAST(SUM(CAST(nb AS HUGEINT) * nb // ndvb) AS BIGINT)
                       AS est_b100
            FROM bk
        )
        SELECT ex.n_rows, ex.ndv, ex.exact_pairs,
               CAST(CAST(ex.n_rows AS HUGEINT) * ex.n_rows // ex.ndv
                    AS BIGINT) AS est_global,
               eb.est_b100,
               CAST(ABS(CAST(ex.n_rows AS HUGEINT) * ex.n_rows // ex.ndv
                        - ex.exact_pairs) * 1000000 // ex.exact_pairs
                    AS BIGINT) AS err_global_ppm,
               CAST(ABS(CAST(eb.est_b100 AS HUGEINT) - ex.exact_pairs)
                    * 1000000 // ex.exact_pairs AS BIGINT) AS err_b100_ppm
        FROM ex, eb
    """,
    doc=(
        "Join-size estimation audit for the partkey self-join: exact "
        "Σc², the optimizer's uniform n²/ndv estimate, and a 100-key "
        "histogram-bucketed estimate, with ppm errors — the case for "
        "histogram statistics, computed from ONE per-key count "
        "aggregate without materializing any join."
    ),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    ck = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dec = "decimal(38,0)"
    ex = ck.agg(
        F.sum(F.expr(f"CAST(c AS {dec}) * c")).cast("long").alias("exact_pairs"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
    )
    bk = ck.groupBy(F.expr("l_partkey DIV 100").alias("b")).agg(
        F.sum("c").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("ndvb"),
    )
    eb = bk.agg(
        F.sum(F.expr(f"CAST(nb AS {dec}) * nb DIV ndvb"))
        .cast("long")
        .alias("est_b100")
    )
    return (
        ex.join(F.broadcast(eb))
        .select(
            "n_rows",
            "ndv",
            "exact_pairs",
            F.expr(f"CAST(CAST(n_rows AS {dec}) * n_rows DIV ndv AS BIGINT)").alias(
                "est_global"
            ),
            "est_b100",
            F.expr(
                f"CAST(ABS(CAST(n_rows AS {dec}) * n_rows DIV ndv - exact_pairs)"
                f" * 1000000 DIV exact_pairs AS BIGINT)"
            ).alias("err_global_ppm"),
            F.expr(
                f"CAST(ABS(CAST(est_b100 AS {dec}) - exact_pairs)"
                f" * 1000000 DIV exact_pairs AS BIGINT)"
            ).alias("err_b100_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order vs linear clustering, head-to-head (r6) — zorder_layout_stats
# measures curve locality and zonemap_skipping_audit measures 1-D
# pruning; this query closes the loop by PRICING THE LAYOUT DECISION:
# the same part table is laid out two ways into 32 equal-row chunks —
# lexicographic (p_size, price) vs Morton-interleaved z-order — and a
# 2-D box predicate (size ∈ [10,20] ∧ price ∈ [$500,$1000]) is priced
# against each layout's per-chunk min-max zone maps. The linear layout
# prunes on the leading dimension only; z-order prunes on both — the
# two output rows ARE the argument for z-ordering 2-D-filtered tables.
# Exact integers throughout (ranks tiebroken by p_partkey; chunk =
# (rank−1)·32 DIV n).
# 100 TB: this is an offline layout-planning query over a DIMENSION
# table (the global ranks are dimension-sized); the layout it prices
# is what the write path (functions/zorder.py) produces.
# ---------------------------------------------------------------------------
_ZVL_CHUNKS = 32


def _zvl_oracle() -> str:
    from stacktrend_spark.functions.rounding import sql_iscale
    from stacktrend_spark.functions.zorder import sql_zorder_key2

    zkey = sql_zorder_key2("p_size", f"({sql_iscale('p_retailprice')}) // 256", 16)
    return f"""
        WITH base AS (
            SELECT p_partkey, p_size,
                   {sql_iscale('p_retailprice')} AS cents,
                   {zkey} AS zkey
            FROM part
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (ORDER BY p_size, cents, p_partkey) AS r_lin,
                   ROW_NUMBER() OVER (ORDER BY zkey, p_partkey)          AS r_z,
                   COUNT(*) OVER () AS n
            FROM base
        ),
        chunks AS (
            SELECT 'linear' AS layout,
                   (r_lin - 1) * {_ZVL_CHUNKS} // n AS chunk,
                   p_size, cents
            FROM ranked
            UNION ALL
            SELECT 'zorder' AS layout,
                   (r_z - 1) * {_ZVL_CHUNKS} // n AS chunk,
                   p_size, cents
            FROM ranked
        ),
        zones AS (
            SELECT layout, chunk,
                   MIN(p_size) AS smin, MAX(p_size) AS smax,
                   MIN(cents) AS cmin, MAX(cents) AS cmax,
                   COUNT(*) AS n_rows
            FROM chunks GROUP BY 1, 2
        ),
        preds AS (
            SELECT 'size_and_price' AS predicate UNION ALL
            SELECT 'price_only'
        ),
        priced AS (
            SELECT z.layout, p.predicate, z.n_rows,
                   CASE WHEN p.predicate = 'size_and_price'
                        THEN (z.smax < 10 OR z.smin > 20
                              OR z.cmax < 50000 OR z.cmin > 100000)
                        ELSE (z.cmax < 50000 OR z.cmin > 100000)
                   END AS pruned
            FROM zones z CROSS JOIN preds p
        )
        SELECT layout, predicate,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
                   AS chunks_pruned,
               CAST(SUM(CASE WHEN pruned THEN n_rows ELSE 0 END) AS BIGINT)
                   AS rows_pruned,
               CAST(SUM(CASE WHEN pruned THEN n_rows ELSE 0 END) * 1000000
                    // SUM(n_rows) AS BIGINT) AS pruned_ppm
        FROM priced
        GROUP BY layout, predicate
    """


@register(
    "zorder_vs_linear_skipping",
    oracle=_zvl_oracle(),
    doc=(
        "Layout decision priced head-to-head: the same table chunked "
        "32 ways under lexicographic vs Morton z-order, a 2-D box "
        "predicate priced against each layout's min-max zone maps — "
        "chunks/rows pruned and exact ppm share per layout; the "
        "two-row argument for z-ordering 2-D-filtered tables."
    ),
)
def zorder_vs_linear_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.rounding import iscale
    from stacktrend_spark.functions.zorder import zorder_key2

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", iscale("p_retailprice").alias("cents")
    )
    base = part.withColumn(
        "zkey", zorder_key2(F.col("p_size"), F.expr("cents DIV 256"), 16)
    )
    # both layout ranks through the two-phase global rank (r10,
    # extending r9 verdict task 2 — the frame is the whole part
    # table), chained so no join-back is needed; n comes back as a
    # broadcast 1-row count instead of COUNT(*) OVER ()
    from stacktrend_spark.operators.ranking import global_rank_scalable

    nn = base.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        global_rank_scalable(
            global_rank_scalable(
                base,
                order_cols=[F.col("p_size"), F.col("cents"), F.col("p_partkey")],
                rank_col="r_lin",
            ),
            order_cols=[F.col("zkey"), F.col("p_partkey")],
            rank_col="r_z",
        )
        .select("p_size", "cents", "r_lin", "r_z")
        .crossJoin(F.broadcast(nn))
    )
    # One pass over the doubly-ranked frame: the previous unionByName of
    # two projections replayed the ENTIRE double-rank subtree per branch
    # (8 part scans + duplicated rank exchanges —
    # plans/r13/zorder_vs_linear_skipping_before.txt); exploding a
    # 2-struct array emits the identical (layout, chunk, p_size, cents)
    # rows from ONE computation of both ranks (guide §2.4).
    both = ranked.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.expr(f"(r_lin - 1) * {_ZVL_CHUNKS} DIV n").alias("chunk"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"(r_z - 1) * {_ZVL_CHUNKS} DIV n").alias("chunk"),
                ),
            )
        ).alias("lc"),
        "p_size",
        "cents",
    ).select("lc.layout", "lc.chunk", "p_size", "cents")
    zones = (
        both.groupBy("layout", "chunk")
        .agg(
            F.min("p_size").alias("smin"),
            F.max("p_size").alias("smax"),
            F.min("cents").alias("cmin"),
            F.max("cents").alias("cmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    preds = zones.sparkSession.createDataFrame(
        [("size_and_price",), ("price_only",)], ["predicate"]
    )
    priced = zones.crossJoin(F.broadcast(preds)).select(
        "layout",
        "predicate",
        "n_rows",
        F.when(
            F.col("predicate") == "size_and_price",
            (F.col("smax") < 10)
            | (F.col("smin") > 20)
            | (F.col("cmax") < 50000)
            | (F.col("cmin") > 100000),
        )
        .otherwise((F.col("cmax") < 50000) | (F.col("cmin") > 100000))
        .alias("pruned"),
    )
    return priced.groupBy("layout", "predicate").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("pruned"), 1).otherwise(0))
        .cast("long")
        .alias("chunks_pruned"),
        F.sum(F.when(F.col("pruned"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_pruned"),
        F.expr(
            "SUM(CASE WHEN pruned THEN n_rows ELSE 0 END) * 1000000"
            " DIV SUM(n_rows)"
        )
        .cast("long")
        .alias("pruned_ppm"),
    )


# ---------------------------------------------------------------------------
# DYNAMIC partition pruning (r7) — the runtime twin of
# source_partition_pruning above: there the predicate is a literal
# (resolved at listing time); here the partition filter is the RESULT
# OF A BROADCAST-DIM FILTER (calendar rows marked is_window), so static
# pruning is impossible and Catalyst must inject a
# DynamicPruningExpression on the partition column — the fact scan
# reads only the qualifying day directories, decided after the dim
# side runs.
# The optimizer feature every star-schema 100 TB query depends on;
# plan shape pinned in tests (dynamicpruningexpression present).
# ---------------------------------------------------------------------------
@register(
    "source_dynamic_partition_pruning",
    oracle="""
        WITH ev AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_no,
                   CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)  AS cents
            FROM events
        ),
        cal AS (
            SELECT DISTINCT day_no, day_no % 7 < 2 AS is_window
            FROM ev
        )
        SELECT e.day_no,
               CAST(COUNT(*) AS BIGINT)     AS n_events,
               CAST(SUM(e.cents) AS BIGINT) AS sum_value_cents
        FROM ev e JOIN cal c USING (day_no)
        WHERE c.is_window
        GROUP BY e.day_no
    """,
    doc=(
        "Dynamic partition pruning: day-partitioned fact joined to a "
        "disk-resident calendar dim filtered at read time — Catalyst injects a "
        "DynamicPruningExpression so only 3 of ~30 day directories "
        "are scanned; value-checked, plan shape pinned."
    ),
)
def source_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dpp_frame(spark, sf_dir)


#: fixture cache: sf_dir → (fact_dir, cal_dir). The partitioned fact +
#: calendar dim are write-once inputs; rebuilding them per invocation
#: leaked mkdtemp copies and folded two full parquet writes into every
#: "warm" bench timing (r7 ADVICE). Registered atexit for cleanup.
_DPP_FIXTURES: dict[str, tuple[str, str]] = {}


def _dpp_fixture_dirs(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    cached = _DPP_FIXTURES.get(sf_dir)
    if cached is not None:
        return cached
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day_no"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    base = _tmpdir("stacktrend_dpp_")
    ev.write.mode("overwrite").partitionBy("day_no").parquet(base)
    # calendar dim ON DISK with a read-time filter: the filter on the
    # build side is what makes Catalyst classify the join as prunable
    # (a computed/limit dim without a filter predicate does not
    # qualify for DPP — measured in this repo before this form)
    cal_dir = _tmpdir("stacktrend_dpp_cal_")
    ev.select("day_no").distinct().withColumn(
        "window_flag", F.expr("CAST(day_no % 7 < 2 AS INT)")
    ).write.mode("overwrite").parquet(cal_dir)
    _DPP_FIXTURES[sf_dir] = (base, cal_dir)
    return base, cal_dir


def _dpp_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by the registered query and the plan-shape test."""
    base, cal_dir = _dpp_fixture_dirs(spark, sf_dir)
    fact = _read_or_empty(spark, base, "cents long, day_no int")
    # the hive partition directory values read back as INT; the dim
    # side must match that type exactly or the cast lands on the
    # PARTITION attribute and the DPP rule no longer matches the scan
    cal = (
        _read_or_empty(spark, cal_dir, "day_no long, window_flag int")
        .filter(F.col("window_flag") == 1)
        .select(F.col("day_no").cast("int").alias("day_no"))
    )
    return (
        fact.join(F.broadcast(cal), "day_no")
        .groupBy(F.col("day_no").cast("long").alias("day_no"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_value_cents"),
        )
    )
