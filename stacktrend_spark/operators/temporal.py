"""Temporal join operators Spark lacks natively: as-of join and
banded range join.

Neither exists in the reference (SURVEY §2.3: "Absent: theta/range/
as-of/interval joins") nor as a Spark builtin — both are classic
requirements of time-series / training-data pipelines, so the engine
provides them as compositions of existing DataFrame ops that keep
their scale properties honest:

- **as-of join** (most recent right row at-or-before each left row,
  per key): implemented as union → per-key event-time sort → carry the
  last right ROW atomically (one ``last(struct(...), ignorenulls=True)``)
  → filter back to left rows. ONE shuffle on the key, no range
  blow-up, no skewed inequality join — the standard distributed as-of
  plan. (A sort-merge inequality join would be O(|L|·|R|) per key.)
- **banded range join** (point-in-interval): equi-join on a coarse
  time bucket first, verify the exact range second. Each interval is
  replicated to every band it touches (``sequence(band, end_band,
  band_step)``), so candidate volume is O(|points| ·
  intervals-per-band) instead of O(|points| · |intervals|); the band
  key makes it an equi-join Catalyst can broadcast or hash-partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` sharing ``key`` (backward as-of,
    inclusive). Left rows with no prior right row keep nulls.

    Returns all left columns plus ``{prefix}{col}`` for each payload
    column and ``{prefix}ts`` (the matched right timestamp).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r = right.select(
        F.col(key),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l.columns)  # align column order for union
    unioned = l.unionByName(r)
    # right rows sort BEFORE left rows at equal timestamps, so an
    # exactly-simultaneous right row is visible to the left row; the
    # payload struct is the final key so two right rows sharing
    # (key, ts) resolve DETERMINISTICALLY (the max payload tuple wins —
    # any total order works, it just must not be the shuffle order;
    # r8 review). Left rows carry NULL payloads, which sort first under
    # asc and therefore never displace a right row.
    w = (
        W.partitionBy(key)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_right").desc(),
            F.struct(*[F.col(f"_r_{c}") for c in right_payload]).asc(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # ONE last(ignorenulls) over a struct of the whole right row, so
    # the matched row is carried ATOMICALLY: a NULL in one payload
    # column of the winning right row stays NULL instead of being
    # back-filled per-column from an older right row (r9 ADVICE — the
    # per-column form only honored "max payload tuple wins" per
    # column, not per row). The struct is non-NULL for every right row
    # (even an all-NULL payload), so ignorenulls skips exactly the
    # left rows.
    matched = F.when(
        F.col("_is_right") == 1,
        F.struct(
            F.col("_r_ts").alias("r_ts"),
            *[F.col(f"_r_{c}").alias(f"p_{c}") for c in right_payload],
        ),
    )
    carried = unioned.select(
        *lcols,
        "_is_right",
        F.last(matched, ignorenulls=True).over(w).alias("_m"),
    )
    return carried.filter(F.col("_is_right") == 0).select(
        *lcols,
        *[F.col(f"_m.p_{c}").alias(f"{prefix}{c}") for c in right_payload],
        F.col("_m.r_ts").alias(f"{prefix}ts"),
    )


def range_join_banded(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    band: Column,
    point_band: Column,
    end_exclusive: bool = True,
    end_band: Column | None = None,
    band_step: Column | None = None,
) -> DataFrame:
    """Point-in-interval join via band equi-join + exact verification.

    ``band``/``point_band`` map interval starts and points onto the
    same coarse grid (e.g. ``F.date_trunc("day", ...)``). An interval
    crossing band boundaries is handled by replicating it to EVERY
    band it touches: pass ``end_band`` (the same grid function over
    ``end_ts``) plus ``band_step`` (the grid pitch, e.g.
    ``F.expr("INTERVAL 1 DAY")``) and the replicas come from
    ``sequence(band, end_band, band_step)`` — an interval spanning any
    number of bands keeps all its matches, a one-band interval still
    produces one row, and a point joins at most one replica because
    the point carries a single band value, so no output duplicates
    are possible (r9 ADVICE: the former two-element start/end probe
    silently lost middle-band matches for 3+-band intervals, so
    ``end_band`` now REQUIRES the step instead of a docstring
    constraint). Omitting ``end_band`` keeps the start-band-only
    behavior, correct ONLY when the caller guarantees intervals never
    cross a band boundary. The equi-join on the band key is broadcast-
    or hash-joinable; the exact BETWEEN check then prunes the few
    in-band false candidates.

    Scale note: replica count per interval = bands spanned — bounded
    by interval-width / band-width, which the caller controls by
    picking the grid; candidate volume stays O(|points| ·
    intervals-per-band).

    Grid direction: the inverted-interval guard is direction-aware
    (r9 ADVICE — a plain ``band <= end_band`` filter would silently
    drop EVERY interval for a descending-grid caller): it keeps rows
    whose band range matches the sign of ``band_step``, so ascending
    grids drop end<start glitch rows exactly as before and a
    (hypothetical) descending grid replicates correctly instead of
    emptying. A zero ``band_step`` still fails at ``sequence()``
    (degenerate configuration, fail-fast is correct).
    """
    if end_band is not None and band_step is None:
        raise ValueError(
            "range_join_banded: end_band requires band_step (the grid "
            "pitch) so boundary-crossing intervals replicate to every "
            "band they span"
        )
    p = points.withColumn("_band", point_band)
    if end_band is None:
        bands = F.array(band)
        iv = intervals
    else:
        bands = F.sequence(band, end_band, band_step)
        # an inverted interval (end < start, a routine feed glitch)
        # must DROP, not crash: sequence() throws at task level when
        # the range disagrees with the step sign and would abort the
        # job — the exact BETWEEN verification could never match such
        # a row anyway, so filtering it here preserves the old
        # no-match semantics (r9 review finding). The guard derives
        # the grid direction from band_step itself so a descending
        # grid keeps its well-formed rows (r9 ADVICE).
        step_ascending = (band + band_step) > band
        iv = intervals.filter(
            F.when(step_ascending, band <= end_band).otherwise(
                band >= end_band
            )
        )
    iv = iv.withColumn("_band", F.explode(bands))
    upper = (
        F.col(point_ts) < F.col(end_ts)
        if end_exclusive
        else F.col(point_ts) <= F.col(end_ts)
    )
    return (
        p.join(F.broadcast(iv), "_band")
        .filter((F.col(point_ts) >= F.col(start_ts)) & upper)
        .drop("_band")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_us: str,
    right_us: str,
    tolerance_us: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Nearest-within-tolerance join: for each left row, the single
    right row sharing ``key`` whose timestamp is closest in EITHER
    direction and within ``tolerance_us``; ties break on the lower
    right id. Rows with no candidate drop (inner semantics).

    The as-of complement: asof_join looks strictly backward; sensor
    alignment / enrichment often wants nearest-in-time. Plan shape is
    the banded range join (range_join_banded rationale): each left row
    joins its time bucket ±1 (bucket width = tolerance), so candidate
    fan-out is bounded by per-bucket density and the join is a pure
    equi-join on (key, bucket) — never a time-sorted merge of the full
    streams and never a cross product. Input ts columns are epoch-µs
    longs (the repo's cross-engine convention).
    """
    lb = left.withColumn("_b", F.expr(f"{left_us} div {tolerance_us}"))
    l3 = lb.withColumn(
        "_jb", F.explode(F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1))
    )
    rb = right.withColumn("_jb", F.expr(f"{right_us} div {tolerance_us}"))
    cand = l3.join(rb, [key, "_jb"]).filter(
        F.abs(F.col(left_us) - F.col(right_us)) <= tolerance_us
    )
    w = W.partitionBy(left_id).orderBy(
        F.abs(F.col(left_us) - F.col(right_us)).asc(), F.col(right_id).asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_b", "_jb", "_rn")
    )
