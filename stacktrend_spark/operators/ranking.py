"""Scalable global ranking: two-phase range-partitioned row numbering.

A global ``row_number() OVER (ORDER BY ...)`` is a single-partition
window — SURVEY §2.5 W1 notes the reference's five global rank columns
(silver_to_gold_analytics.py:225-236) are fine at its ~1k-row
cardinality but a scale hazard: ALL rows funnel through one task.

The distributed plan here is the classic two-phase ranking:

1. ``repartitionByRange`` on the order keys — rows land in partitions
   whose id order matches the sort order (Spark's RangePartitioner
   contract), each partition holding a contiguous key range;
2. per-partition local ``row_number`` (parallel — the window partitions
   by ``spark_partition_id``);
3. per-partition counts (one tiny job: ≤ #partitions rows) turn into
   cumulative offsets, broadcast-joined back; global rank = offset +
   local rank.

Total cost: one range shuffle + one O(#partitions) driver step —
instead of one task sorting 100 TB. Results are identical to the
single-partition window whenever the order keys are a total order
(pass a unique tiebreaker), which is what the oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank_scalable(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number by ``order_cols`` without a
    single-partition window. ``order_cols`` must define a total order
    (include a unique tiebreaker) for a deterministic result."""
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(w))
        # the counts job below and the final join both read this plan —
        # persist so the range shuffle runs once (SURVEY §4 pattern 1)
        .persist()
    )
    counts = sorted(
        (r["_pid"], r["_n"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_offset")
    )


def global_running_sum_scalable(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` by ``order_cols``
    without a single-partition window — same two-phase shape as
    :func:`global_rank_scalable` but the per-partition driver step
    carries partial SUMS instead of counts. ``order_cols`` must define
    a total order (include a unique tiebreaker); ``value_col`` must be
    INTEGER-typed (the exact-arithmetic contract every caller already
    follows — a float value_col raises rather than silently truncating,
    and an all-NULL partition contributes 0 instead of crashing the
    driver fold; r8 review). The explicit ROWS frame avoids the
    default RANGE frame's tie-grouping."""
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    w = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lsum", F.sum(value_col).over(w))
        .persist()
    )
    partials = sorted(
        (r["_pid"], r["_s"])
        for r in local.groupBy("_pid").agg(F.sum(value_col).alias("_s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in partials:
        if s is None:  # every value in this range partition was NULL
            s = 0
        if not isinstance(s, int):
            raise TypeError(
                f"global_running_sum_scalable needs an integer value_col "
                f"(exact offsets); got partial sum {s!r} — iscale the "
                "column first"
            )
        offsets.append((pid, acc))
        acc += s
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(sum_col, (F.col("_offset") + F.col("_lsum")).cast("long"))
        .drop("_pid", "_lsum", "_offset")
    )


def global_running_max_scalable(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    max_col: str = "running_max",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running MAX of ``value_col`` by ``order_cols``
    without a single-partition window — completes the two-phase family
    (rank / running sum / running max). Same shape: range shuffle on
    the order keys, per-partition local running max, then the
    O(#partitions) driver fold carries the prefix-max of whole prior
    partitions, broadcast back and combined with ``greatest`` (which
    skips NULLs, so the first row of the first partition stays NULL in
    exclusive mode exactly like the windowed form).

    ``inclusive=False`` gives the dominance-sweep frame
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` (skyline /
    Pareto frontier); ``inclusive=True`` the usual running max.
    ``order_cols`` must define a total order (unique tiebreaker) for a
    deterministic result; NULL values in ``value_col`` are skipped by
    MAX on both phases, matching the window semantics.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    upper = 0 if inclusive else -1
    w = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, upper)
    )
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lmax", F.max(value_col).over(w))
        .persist()
    )
    partials = sorted(
        (r["_pid"], r["_m"])
        for r in local.groupBy("_pid").agg(F.max(value_col).alias("_m")).collect()
    )
    offsets = []
    run = None
    for pid, m in partials:
        offsets.append((pid, run))
        if m is not None and (run is None or m > run):
            run = m
    spark = df.sparkSession
    value_type = dict(df.dtypes)[value_col]
    off_df = spark.createDataFrame(offsets, f"_pid int, _offset {value_type}")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(max_col, F.greatest(F.col("_offset"), F.col("_lmax")))
        .drop("_pid", "_lmax", "_offset")
    )
