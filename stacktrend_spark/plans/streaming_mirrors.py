"""Oracle-checked Structured Streaming queries.

Each entry builds a true streaming plan (readStream file source →
event-time stateful operator), executes it to completion with
``trigger(availableNow)`` into a memory sink, and returns the
materialized batch result — so the driver's DuckDB oracle checks the
STREAMING output value-for-value, not a batch stand-in.

The reference approximates all of these with scheduled batch reruns
(SURVEY §2.10: data_factory_pipelines.py:74-84, tumbling triggers;
personal_repos_bronze_to_silver.py:578-624, lookback refilters;
personal_repos_ingestion.py:424-431, insert-only MERGE dedup); this
module is their native incremental form.

Determinism note: over a finite input processed by availableNow, the
watermark drops nothing (it only advances between micro-batches), so
the streaming result equals the batch-over-same-input result — which is
exactly what the SQL oracles express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import sql_dsum
from stacktrend_spark.plans.registry import register
from stacktrend_spark.streaming.events import (
    dedup_stream,
    load_events_stream,
    run_to_batch,
    session_windows,
    sliding_user_activity,
    stateful_user_totals,
    tumbling_counts,
)

_DAY_US = 86_400_000_000
_GAP_US = 30 * 60 * 1_000_000  # keep in sync with SESSION_GAP


@register(
    "stream_tumbling_daily",
    oracle=f"""
        SELECT
            epoch_us(date_trunc('day', ts))  AS window_start_us,
            event_type,
            CAST(COUNT(*) AS BIGINT)         AS n_events,
            {sql_dsum('value', 2)}           AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Streaming tumbling 1-day window per event_type (watermarked, complete mode).",
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events_stream(spark, sf_dir)
    return run_to_batch(
        tumbling_counts(ev, "1 day"),
        "stream_tumbling_daily_sink",
        state_partitions=8,
    )


@register(
    "stream_sliding_2d",
    oracle=f"""
        WITH offsets AS (SELECT UNNEST([0, 1]) AS k)
        SELECT
            epoch_us(date_trunc('day', ts)) - k * {_DAY_US} AS window_start_us,
            user_id,
            CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events CROSS JOIN offsets
        GROUP BY 1, 2
    """,
    doc="Streaming sliding window (2d width / 1d slide) per user — each event lands in 2 windows.",
)
def stream_sliding_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events_stream(spark, sf_dir)
    return run_to_batch(
        sliding_user_activity(ev, "2 days", "1 day"),
        "stream_sliding_2d_sink",
        state_partitions=8,
    )


@register(
    "stream_session_windows",
    # Spark's session_window closes a session only when the next event
    # is STRICTLY MORE than gap after the previous one: each event's
    # window is [ts, ts+gap) and windows merge while next.start <=
    # current.end, so an event at EXACTLY prev+gap still merges
    # (adjacent windows touch). The r12 streaming property campaign
    # caught the original >= comparison disagreeing with Spark on that
    # knife edge (real data never lands exactly 30 min apart, so
    # eleven driver rounds of hash-green never saw it); the strict >
    # below — same operator session_window_native_batch's oracle
    # always used — mirrors Spark exactly.
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
                user_id, ts_us,
                SUM(is_new_session) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM seq
        )
        SELECT
            user_id,
            CAST(MIN(ts_us) AS BIGINT)  AS session_start_us,
            CAST(COUNT(*) AS BIGINT)    AS n_events
        FROM sess
        GROUP BY user_id, session_seq
    """,
    doc="Streaming session windows per user (30-min gap), native F.session_window state.",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events_stream(spark, sf_dir)
    return run_to_batch(
        session_windows(ev), "stream_session_windows_sink", state_partitions=8
    )


@register(
    "stream_stateful_totals",
    # one availableNow batch over the finite input → each user emits its
    # final running total, which equals the batch aggregate below
    oracle="""
        SELECT
            user_id,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                AS sum_value_cents
        FROM events
        GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState): exact per-user running totals.",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events_stream(spark, sf_dir)
    return run_to_batch(
        stateful_user_totals(ev),
        "stream_stateful_totals_sink",
        output_mode="update",
        # NO state_partitions override here: this operator's cost is the
        # Python workers, not the state stores — 32 partitions = 32
        # parallel Arrow/pandas workers (measured faster than 8)
    )


# NOTE: streaming/events.stateful_user_totals_tws (the Spark 4
# transformWithStateInPandas successor to the operator above) is NOT
# registered as a driver query: the v2 API's state protocol needs
# google.protobuf, which this environment lacks (import-guarded in the
# operator; tests/test_streaming.py skips accordingly). The v1
# applyInPandasWithState query above stays the proven surface.


@register(
    "stream_dedup_events",
    oracle="""
        SELECT
            event_id,
            epoch_us(ts)  AS ts_us,
            user_id,
            event_type,
            value
        FROM events
    """,
    doc="Streaming insert-only-merge dedup: doubled stream → watermarked dropDuplicates.",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # union the stream with itself so every event is delivered twice —
    # the dedup state must suppress the re-delivery (the streaming form
    # of MERGE WHEN NOT MATCHED, personal_repos_ingestion.py:424-431)
    ev = load_events_stream(spark, sf_dir)
    doubled = ev.unionByName(load_events_stream(spark, sf_dir))
    deduped = dedup_stream(doubled, "1 day").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    return run_to_batch(
        deduped, "stream_dedup_events_sink", output_mode="append", state_partitions=8
    )


@register(
    "stream_stream_attribution",
    oracle="""
        SELECT
            p.event_id                     AS purchase_id,
            v.event_id                     AS view_id,
            p.user_id,
            epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        FROM events p
        JOIN events v
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase'
         AND v.event_type = 'view'
         AND v.ts >= p.ts - INTERVAL 1 DAY
         AND v.ts <= p.ts
    """,
    doc=(
        "Stream-stream interval join (watermarked both sides): each "
        "purchase pairs with the same user's views from the trailing "
        "day — attribution with state bounded by the watermark horizon."
    ),
)
def stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.streaming.events import interval_join_streams

    # project to the 3 join-relevant columns BEFORE the stream-stream
    # join: only (event_id, user_id, ts) enters join state and the
    # shuffle — at scale the state store holds a horizon of 3-column
    # rows, not full events
    purchases = (
        load_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    views = (
        load_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts")
    )
    return run_to_batch(
        interval_join_streams(purchases, views, "1 day"),
        "stream_stream_attribution_sink",
        output_mode="append",
        state_partitions=8,
    )


@register(
    "stream_upsert_user_totals",
    # result = totals over ALL events, however they were split between
    # the batch seed and the streamed increments — the invariant that
    # makes incremental materialization trustworthy.
    oracle="""
        SELECT
            user_id,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            -- outer CAST is load-bearing: DuckDB types SUM(BIGINT) as
            -- HUGEINT, which hash-diverges from Spark's BIGINT even when
            -- every value is equal (r3 red; see stream_stateful_totals)
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                AS sum_cents
        FROM events
        GROUP BY 1
    """,
    doc=(
        "foreachBatch incremental materialization: a batch-seeded totals "
        "table is additively upserted by the streamed remainder — final "
        "state equals the full batch aggregate (split-invariant)."
    ),
)
def stream_upsert_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from stacktrend_spark.functions.rounding import iscale
    from stacktrend_spark.sources.tables import load_table

    # per-invocation dir: a fixed path let two concurrent harness
    # processes clobber each other's sink (observed as partial totals);
    # mkdtemp's exclusive creation IS the reservation — don't remove it
    base = tempfile.mkdtemp(prefix="stream_upsert_totals_")
    target = os.path.join(base, "table")
    checkpoint = os.path.join(base, "ckpt")

    # The totals table is hash-bucketed into partition directories by
    # user_id so a micro-batch touches only the buckets its keys hash
    # to: the read prunes to touched partitions and the write swaps
    # only those directories — per-batch I/O is O(batch keys · bucket
    # size), NOT O(table) (the r3 full-table stage-and-swap was a
    # named scale-killer). At scale, size n_buckets ≈ table_rows /
    # target_bucket_rows; with delta-spark present this whole function
    # is one `MERGE INTO t USING s ... UPDATE SET t.n = t.n + s.n`
    # (operators/merge.py delta backend) — file-level rewrite with data
    # skipping and an atomic log instead of directory swaps.
    n_buckets = 32

    def totals(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(iscale("value", 2)).cast("long").alias("sum_cents"),
        )

    def bucketed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
        )

    # seed: materialize totals for a deterministic slice of history
    seed = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    bucketed(totals(seed)).write.mode("overwrite").partitionBy("bucket").parquet(
        target
    )

    # stream the remainder; each micro-batch merges ADDITIVELY by key
    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = bucketed(totals(batch_df))
        # bounded collect: ≤ n_buckets ints, the partition-pruning list
        touched = sorted(r[0] for r in batch.select("bucket").distinct().collect())
        # r13 degenerate-corpus fix: an EMPTY seed slice writes a
        # fileless target dir and the inference-based read crashed
        # with UNABLE_TO_INFER_SCHEMA; the explicit schema (known —
        # it IS the batch layout) reads the empty target as an empty
        # DataFrame, and skips footer inference on every batch too.
        current = (
            batch_df.sparkSession.read.schema(batch.schema)
            .parquet(target)
            .filter(F.col("bucket").isin(touched))  # directory-pruned scan
        )
        merged = (
            current.select(
                "user_id",
                F.col("n_events").alias("t_n"),
                F.col("sum_cents").alias("t_s"),
            )
            .join(
                batch.select(
                    "user_id",
                    F.col("n_events").alias("s_n"),
                    F.col("sum_cents").alias("s_s"),
                ),
                "user_id",
                "full_outer",
            )
            .select(
                "user_id",
                (F.coalesce("t_n", F.lit(0)) + F.coalesce("s_n", F.lit(0)))
                .cast("long")
                .alias("n_events"),
                (F.coalesce("t_s", F.lit(0)) + F.coalesce("s_s", F.lit(0)))
                .cast("long")
                .alias("sum_cents"),
            )
        )
        # parquet has no atomic overwrite-in-place, and Spark (rightly)
        # refuses to overwrite a path it is reading: stage the touched
        # buckets, then swap ONLY those partition directories — the
        # same commit pattern as dynamic partition overwrite.
        staged = target + f".staged-{batch_id}"
        bucketed(merged).write.mode("overwrite").partitionBy("bucket").parquet(
            staged
        )
        for k in touched:
            src = os.path.join(staged, f"bucket={k}")
            dst = os.path.join(target, f"bucket={k}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.rename(src, dst)
        shutil.rmtree(staged)

    # stage the remainder as THREE files and feed them one per trigger:
    # the merge then runs as a genuine multi-batch incremental build
    # (3 successive partition-scoped upserts), not a single-batch
    # degenerate case. Final state is order-independent because the
    # merge is additive-commutative per key — so file arrival order
    # cannot perturb the hashed result.
    feed = os.path.join(base, "feed")
    rest_batch = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 3 != 0
    )
    rest_batch.repartition(3, F.col("event_id")).write.mode("overwrite").parquet(
        feed
    )
    rest = (
        spark.readStream.schema(rest_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        rest.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    # r13 empty-corpus fix: explicit schema (the upsert layout is
    # known) — an all-empty run leaves a fileless target and schema
    # inference raised; the explicit read also skips footer inference.
    return (
        spark.read.schema(
            "user_id long, n_events long, sum_cents long, bucket int"
        )
        .parquet(target)
        .select("user_id", "n_events", "sum_cents")
    )


@register(
    "stream_static_enrichment",
    oracle="""
        SELECT
            c.c_mktsegment,
            e.event_type,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            -- outer CAST: DuckDB SUM(BIGINT) -> HUGEINT hash divergence
            CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                AS sum_cents
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    doc=(
        "Stream-static enrichment: streaming events join a static customer "
        "dim (broadcast per micro-batch) then roll up per (segment, type) — "
        "the standard slowly-changing-dimension streaming pattern."
    ),
)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.sources.tables import load_table
    from stacktrend_spark.streaming.events import enrich_with_static

    ev = load_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    return run_to_batch(
        enrich_with_static(ev, cust),
        "stream_static_enrichment_sink",
        state_partitions=8,
    )


@register(
    "stream_topk_users_daily",
    oracle="""
        WITH daily AS (
            SELECT epoch_us(date_trunc('day', ts)) AS window_start_us,
                   user_id,
                   CAST(COUNT(*) AS BIGINT)        AS n_events
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY window_start_us
                ORDER BY n_events DESC, user_id) AS rnk
            FROM daily
        )
        SELECT window_start_us, user_id, n_events,
               CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5
    """,
    doc=(
        "Streaming top-k: incremental tumbling per-(day, user) counts "
        "(the stateful streaming half), then the rank over the "
        "materialized daily aggregate on the serving side — ranking "
        "inside the stream would need complete-mode state over all "
        "users; ranking the compact aggregate after is the scalable "
        "split."
    ),
)
def stream_topk_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_events_stream(spark, sf_dir)
    daily = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "user_id",
            "n_events",
        )
    )
    agg = run_to_batch(daily, "stream_topk_users_daily_sink", state_partitions=8)
    rnk = F.row_number().over(
        W.partitionBy("window_start_us").orderBy(
            F.desc("n_events"), F.asc("user_id")
        )
    )
    return agg.select(
        "window_start_us", "user_id", "n_events", rnk.alias("rnk")
    ).filter(F.col("rnk") <= 5)


# ---------------------------------------------------------------------------
# Streaming × sketch (r5): daily distinct users via the KMV sketch
# (plans/sketches.py rationale — the estimate is a pure function of
# the data, so unlike streaming HLL it stays hash-checkable). The
# STREAM maintains per-(day, hash) presence — an incremental,
# watermark-bounded aggregate whose state is the distinct-hash set per
# window (exactly what a production KMV would keep, capped at K per
# key by the periodic compaction the serving side applies here). The
# rank-K cut + estimate run on the compact materialized aggregate —
# the same stream/serving split as stream_topk_users_daily.
# ---------------------------------------------------------------------------


@register(
    "stream_kmv_daily_users",
    oracle="""
        WITH uh AS (
            SELECT DISTINCT epoch_us(date_trunc('day', ts)) AS window_start_us,
                   (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 1, 1)) - 1) * CAST(68719476736 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 2, 1)) - 1) * CAST(4294967296 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 3, 1)) - 1) * CAST(268435456 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 4, 1)) - 1) * CAST(16777216 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 5, 1)) - 1) * CAST(1048576 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 6, 1)) - 1) * CAST(65536 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 7, 1)) - 1) * CAST(4096 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 8, 1)) - 1) * CAST(256 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 9, 1)) - 1) * CAST(16 AS BIGINT)
                 + (STRPOS('0123456789abcdef', SUBSTR(SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 10), 10, 1)) - 1) AS h
            FROM events
        ),
        ranked AS (
            SELECT window_start_us, h,
                   ROW_NUMBER() OVER (PARTITION BY window_start_us ORDER BY h) AS rn
            FROM uh
        ),
        mins AS (
            SELECT window_start_us, COUNT(*) AS n_mins, MAX(h) AS h_k
            FROM ranked WHERE rn <= 64 GROUP BY 1
        )
        SELECT window_start_us,
               CAST(CASE WHEN n_mins < 64 THEN n_mins
                         ELSE (63 * CAST(1099511627776 AS BIGINT)) // h_k
                    END AS BIGINT) AS kmv_users
        FROM mins
    """,
    doc=(
        "Streaming KMV distinct-users per day: the stream maintains the "
        "per-(window, hash) presence set incrementally under a "
        "watermark; the rank-64 cut + estimate run on the compact "
        "materialized aggregate — a distinct-count sketch whose "
        "streaming output is bit-reproducible (unlike streaming HLL)."
    ),
)
def stream_kmv_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from stacktrend_spark.plans.sketches import _K, _POW40, _spark_hex40

    ev = load_events_stream(spark, sf_dir)
    presence = (
        ev.withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "1 day").alias("win"),
            _spark_hex40(F.col("user_id")).alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(F.unix_micros(F.col("win.start")).alias("window_start_us"), "h")
    )
    agg = run_to_batch(
        presence, "stream_kmv_daily_users_sink", state_partitions=8
    )
    rn = F.row_number().over(
        W.partitionBy("window_start_us").orderBy("h")
    )
    mins = (
        agg.withColumn("rn", rn)
        .filter(F.col("rn") <= _K)
        .groupBy("window_start_us")
        .agg(F.count(F.lit(1)).alias("n_mins"), F.max("h").alias("h_k"))
    )
    return mins.select(
        "window_start_us",
        F.expr(
            f"CASE WHEN n_mins < {_K} THEN n_mins"
            f" ELSE {_K - 1} * {_POW40}L DIV h_k END"
        )
        .cast("long")
        .alias("kmv_users"),
    )


@register(
    "stream_outer_attribution",
    # the 2-day purchase-side cutoff makes the OUTER decision final by
    # end-of-input: an unmatched purchase null-emits only once the
    # watermark (max ts − 1d delay) passes its timestamp, so purchases
    # younger than that would stay in state forever and the stream
    # result would MISS rows the batch left join has. Both engines
    # apply the identical cutoff, so the comparison is exact.
    oracle="""
        WITH mx AS (SELECT MAX(ts) AS mt FROM events),
        p AS (
            SELECT event_id, user_id, ts FROM events, mx
            WHERE event_type = 'purchase'
              AND ts <= mx.mt - INTERVAL 2 DAY
        ),
        v AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'view'
        )
        SELECT p.event_id                      AS purchase_id,
               v.event_id                      AS view_id,
               p.user_id,
               epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        FROM p LEFT JOIN v
          ON p.user_id = v.user_id
         AND v.ts >= p.ts - INTERVAL 1 DAY
         AND v.ts <= p.ts
    """,
    doc=(
        "LEFT OUTER stream-stream interval join: purchases pair with "
        "the trailing day's views; purchases with NO view in the "
        "window emit a NULL-view row once the watermark expires their "
        "state — the attribution join that also surfaces unattributed "
        "conversions. State bounded by the watermark horizon on both "
        "sides."
    ),
)
def stream_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked outer interval join, run availableNow to a sink.

    100 TB: identical state shape to the inner attribution join (both
    sides shuffle once on user_id; state = trailing horizon of
    3-column rows). The extra cost of OUTER is only the eviction-time
    null emission. The max-ts scalar is a bounded driver collect
    (one row) over the batch view of the same source — at scale the
    cutoff is a pipeline parameter, not a data scan.
    """
    from stacktrend_spark.sources.tables import load_table

    mt = (
        load_table(spark, sf_dir, "events")
        .agg(F.max("ts").alias("mt"))
        .collect()[0]["mt"]
    )
    from datetime import datetime, timedelta

    if mt is None:
        # r13 empty-corpus fix: an empty events table has no max ts —
        # the cutoff arithmetic crashed on the driver. Any fixed epoch
        # gives the correct (empty) result; the stream has no rows.
        mt = datetime(1970, 1, 1)
    cutoff = mt - timedelta(days=2)
    # watermark is attached BEFORE the type/cutoff filters: Spark
    # tracks max event time at the watermark operator, so filtering
    # first would cap this side's watermark at the cutoff and leave a
    # permanent 1-day blind tail of never-evicted (never-null-emitted)
    # purchases — measured as 31 missing rows at sf0.01
    purchases = (
        load_events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "event_type")
        .withWatermark("ts", "1 day")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("ts") <= F.lit(cutoff))
        .drop("event_type")
        .alias("p")
    )
    views = (
        load_events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "event_type")
        .withWatermark("ts", "1 day")
        .filter(F.col("event_type") == "view")
        .drop("event_type")
        .alias("v")
    )
    joined = purchases.join(
        views,
        F.expr(
            "p.user_id = v.user_id"
            " AND v.ts >= p.ts - INTERVAL 1 DAY"
            " AND v.ts <= p.ts"
        ),
        "leftOuter",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.user_id").alias("user_id"),
        (F.unix_micros("p.ts") - F.unix_micros("v.ts")).alias("gap_us"),
    )
    return run_to_batch(
        joined,
        "stream_outer_attribution_sink",
        output_mode="append",
        state_partitions=8,
    )


@register(
    "stream_dedup_within_watermark",
    oracle="""
        SELECT event_id,
               epoch_us(ts) AS ts_us,
               user_id,
               event_type
        FROM events
    """,
    doc=(
        "dropDuplicatesWithinWatermark semantics pin: doubled delivery "
        "deduped on event_id alone, with state TTL'd by the watermark "
        "even though no event-time column is part of the dedup key — "
        "the Spark-3.5+ API that fixes dropDuplicates' unbounded state "
        "when ids never carry event time."
    ),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: identical shape to stream_dedup_events, but the state
    store provably holds ONE watermark horizon of ids — plain
    dropDuplicates on a non-time key would grow state forever on an
    unbounded stream; WithinWatermark is the production-correct form.
    """
    ev = load_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    doubled = ev.unionByName(
        load_events_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type"
        )
    )
    deduped = (
        doubled.withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
        )
    )
    return run_to_batch(
        deduped,
        "stream_dedup_within_watermark_sink",
        output_mode="append",
        state_partitions=8,
    )


# ---------------------------------------------------------------------------
# Streaming HyperLogLog: per-day distinct-user REGISTERS maintained
# incrementally under a watermark. The register update is a windowed
# MAX aggregate — associative and commutative, so Structured
# Streaming's incremental state update IS the sketch merge; state per
# window is <= m=16 register rows regardless of traffic. The estimate
# is derived on the compact materialized aggregate with the same
# libm-free arithmetic as the batch `hll_register_sketch` (m=16 keeps
# daily user cardinality >= 2.5*m so the raw estimator is in its
# standard regime; the exact count is emitted alongside from a batch
# aggregate over the same parquet).
# ---------------------------------------------------------------------------
_SH_M = 16
_SH_POW36 = 1 << 36
_SH_POW37 = 1 << 37
#: alpha_16 * m^2 * 2^37 folded to one double literal (PARITY.md r6:
#: bare decimal literals are DECIMAL in DuckDB and overflow)
_SH_NUM = 0.673 * _SH_M * _SH_M * float(_SH_POW37)


def _stream_hll_oracle() -> str:
    from stacktrend_spark.plans.sketches import _sql_hex40

    return f"""
        WITH h AS (
            SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                       * 86400000000 AS window_start_us,
                   {_sql_hex40("CAST(user_id AS VARCHAR)")} AS hv
            FROM events
        ),
        jr AS (
            SELECT window_start_us,
                   hv // {_SH_POW36} AS j,
                   CASE WHEN hv % {_SH_POW36} = 0 THEN 37
                        ELSE 37 - LENGTH(bin(hv % {_SH_POW36})) END AS rho
            FROM h
        ),
        regs AS (
            SELECT window_start_us, j, MAX(rho) AS m_j
            FROM jr GROUP BY 1, 2
        ),
        est AS (
            SELECT window_start_us,
                   SUM(CAST({_SH_POW37} AS BIGINT) // (1 << m_j)) AS denom,
                   COUNT(*) AS n_regs
            FROM regs GROUP BY 1
        ),
        ex AS (
            SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                       * 86400000000 AS window_start_us,
                   COUNT(DISTINCT user_id) AS exact_users
            FROM events GROUP BY 1
        )
        SELECT e.window_start_us,
               CAST(ex.exact_users AS BIGINT) AS exact_users,
               CAST(FLOOR({_SH_NUM!r}
                    / (CAST(e.denom AS DOUBLE)
                       + CAST(({_SH_M} - e.n_regs) AS DOUBLE)
                         * {float(_SH_POW37)!r})) AS BIGINT) AS hll_users
        FROM est e JOIN ex ON e.window_start_us = ex.window_start_us
    """


@register(
    "stream_hll_daily_users",
    oracle=_stream_hll_oracle(),
    doc=(
        "Streaming HLL (m=16) distinct users per day: register max-agg "
        "maintained incrementally under the watermark (state = 16 rows "
        "per window); estimate derived post-sink with the exact-integer "
        "harmonic denominator — bit-reproducible, unlike the built-in "
        "approx_count_distinct stream."
    ),
)
def stream_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.plans.sketches import _spark_hex40
    from stacktrend_spark.sources.tables import load_table

    ev = load_events_stream(spark, sf_dir)
    regs = (
        ev.withWatermark("ts", "1 day")
        .select("ts", _spark_hex40(F.col("user_id")).alias("hv"))
        .select(
            "ts",
            F.expr(f"hv DIV {_SH_POW36}").alias("j"),
            F.when(F.col("hv") % _SH_POW36 == 0, F.lit(37))
            .otherwise(37 - F.length(F.bin(F.col("hv") % _SH_POW36)))
            .alias("rho"),
        )
        .groupBy(F.window("ts", "1 day").alias("win"), F.col("j"))
        .agg(F.max("rho").alias("m_j"))
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "j",
            "m_j",
        )
    )
    agg = run_to_batch(regs, "stream_hll_daily_users_sink", state_partitions=8)
    est = agg.groupBy("window_start_us").agg(
        F.sum(
            F.expr(f"{_SH_POW37}L DIV shiftleft(1L, CAST(m_j AS INT))")
        ).alias("denom"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    ex = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (
                F.expr("FLOOR(unix_micros(ts) / 86400000000)").cast("long")
                * F.lit(86400000000)
            ).alias("window_start_us")
        )
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    e_col = F.floor(
        F.lit(_SH_NUM)
        / (
            F.col("denom").cast("double")
            + (F.lit(_SH_M) - F.col("n_regs")).cast("double")
            * F.lit(float(_SH_POW37))
        )
    ).cast("long")
    return est.join(ex, "window_start_us").select(
        "window_start_us",
        F.col("exact_users").cast("long").alias("exact_users"),
        e_col.alias("hll_users"),
    )


# ---------------------------------------------------------------------------
# FULL OUTER stream-stream interval join (r6) — completes the
# stream-join matrix (inner: stream_stream_attribution; left-outer:
# stream_outer_attribution). Both sides now null-emit: purchases with
# no trailing-day view AND views that never led to a purchase within
# the following day. Outer-decision finality needs BOTH sides
# clamped: a view's match window is [v.ts, v.ts+1d], so its null
# emission waits for the watermark to pass v.ts+1d — views younger
# than (max − 2d) would sit in state forever at end-of-input. The
# identical 2-day cutoff on both sides (and in the oracle) makes the
# comparison exact.
# ---------------------------------------------------------------------------
@register(
    "stream_full_outer_attribution",
    oracle="""
        WITH mx AS (SELECT MAX(ts) AS mt FROM events),
        p AS (
            SELECT event_id, user_id, ts FROM events, mx
            WHERE event_type = 'purchase'
              AND ts <= mx.mt - INTERVAL 2 DAY
        ),
        v AS (
            SELECT event_id, user_id, ts FROM events, mx
            WHERE event_type = 'view'
              AND ts <= mx.mt - INTERVAL 49 HOUR
        )
        SELECT p.event_id                      AS purchase_id,
               v.event_id                      AS view_id,
               COALESCE(p.user_id, v.user_id)  AS user_id,
               epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        FROM p FULL OUTER JOIN v
          ON p.user_id = v.user_id
         AND v.ts >= p.ts - INTERVAL 1 DAY
         AND v.ts <= p.ts
    """,
    doc=(
        "FULL OUTER stream-stream interval join: attributed pairs PLUS "
        "null-view purchases PLUS never-converting views in one "
        "result. Both sides watermarked and cutoff-clamped so every "
        "outer decision is final by end-of-input; state bounded by the "
        "1-day horizon per side."
    ),
)
def stream_full_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: same state shape as the inner/left-outer attribution
    joins (one user_id shuffle per side, trailing-horizon state); full
    outer adds only eviction-time null emission on the second side.
    The view side's eviction bound derives from the interval term
    (p.ts <= v.ts + 1d), which is why the cutoff must be 2 days: 1 for
    the join horizon + 1 for the watermark delay."""
    from stacktrend_spark.sources.tables import load_table

    mt = (
        load_table(spark, sf_dir, "events")
        .agg(F.max("ts").alias("mt"))
        .collect()[0]["mt"]
    )
    from datetime import datetime, timedelta

    if mt is None:
        # r13 empty-corpus fix (same as stream_outer_attribution)
        mt = datetime(1970, 1, 1)
    cutoff = mt - timedelta(days=2)
    # the view side clamps ONE EXTRA HOUR back: a view's null emission
    # needs the final watermark (max − 1d) to pass v.ts + 1d STRICTLY,
    # so views at exactly max − 2d never evict (measured: 3 stuck rows
    # at sf0.01). The margin is mirrored in the oracle.
    cutoff_v = mt - timedelta(days=2, hours=1)
    # watermark BEFORE the filters (the stream_outer_attribution rule:
    # filtering first caps the watermark and leaves a blind tail)
    purchases = (
        load_events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "event_type")
        .withWatermark("ts", "1 day")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("ts") <= F.lit(cutoff))
        .drop("event_type")
        .alias("p")
    )
    views = (
        load_events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "event_type")
        .withWatermark("ts", "1 day")
        .filter(F.col("event_type") == "view")
        .filter(F.col("ts") <= F.lit(cutoff_v))
        .drop("event_type")
        .alias("v")
    )
    joined = purchases.join(
        views,
        F.expr(
            "p.user_id = v.user_id"
            " AND v.ts >= p.ts - INTERVAL 1 DAY"
            " AND v.ts <= p.ts"
        ),
        "fullOuter",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.coalesce(F.col("p.user_id"), F.col("v.user_id")).alias("user_id"),
        (F.unix_micros("p.ts") - F.unix_micros("v.ts")).alias("gap_us"),
    )
    return run_to_batch(
        joined,
        "stream_full_outer_attribution_sink",
        output_mode="append",
        state_partitions=8,
    )


# ---------------------------------------------------------------------------
# Streaming Count-Min Sketch (r7) — completes the streaming-sketch
# trio (KMV distinct, HLL registers, CMS frequencies). The stream
# maintains the d×w counter grid incrementally (each event updates one
# bucket per hash row, map-side explode; the stateful aggregate is
# bounded at d·w = 1024 keys regardless of stream volume); the batch
# probe then point-queries every event_type against the materialized
# grid — estimate = min over rows, one-sided error ≥ exact. The 40-bit
# md5 rows make the sketch bit-reproducible, so the oracle checks the
# ESTIMATES, not just shape.
# 100 TB: state is 1024 counters per state store — the canonical
# "sketch in the stream, query at rest" pattern; the exact-count side
# exists only for the audit.
# ---------------------------------------------------------------------------
from stacktrend_spark.functions.hashing import spark_hex40, sql_hex40  # noqa: E402

_SCMS_D = 4
_SCMS_W = 256


@register(
    "stream_cms_event_counters",
    oracle=f"""
        WITH grid AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(j)),
        cells AS (
            SELECT g.j,
                   ({sql_hex40("CAST(g.j AS VARCHAR) || ':' || e.event_type")})
                       % {_SCMS_W} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS s
            FROM events e CROSS JOIN grid g
            GROUP BY 1, 2
        ),
        exact AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_cnt
            FROM events GROUP BY 1
        ),
        probe AS (
            SELECT x.event_type, x.exact_cnt, g.j,
                   ({sql_hex40("CAST(g.j AS VARCHAR) || ':' || x.event_type")})
                       % {_SCMS_W} AS bucket
            FROM exact x CROSS JOIN grid g
        )
        SELECT p.event_type,
               CAST(MAX(p.exact_cnt) AS BIGINT) AS exact_cnt,
               CAST(MIN(c.s) AS BIGINT)         AS cms_est,
               CAST((MIN(c.s) - MAX(p.exact_cnt)) * 1000000
                    // MAX(p.exact_cnt) AS BIGINT) AS over_ppm
        FROM probe p JOIN cells c USING (j, bucket)
        GROUP BY p.event_type
    """,
    doc=(
        f"Streaming count-min sketch (d={_SCMS_D}, w={_SCMS_W}): the "
        "stream maintains the bounded counter grid incrementally; the "
        "batch probe point-queries every event_type (min over rows, "
        "one-sided error vs exact counts in ppm). Bit-reproducible "
        "md5 rows — the gate checks estimate values."
    ),
)
def stream_cms_event_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.sources.tables import load_table

    ev = load_events_stream(spark, sf_dir)
    grid = F.explode(F.expr(f"sequence(0, {_SCMS_D - 1})")).alias("j")
    cells_stream = (
        ev.select("event_type")
        .select("event_type", grid)
        .select(
            "j",
            (
                spark_hex40(
                    F.concat(
                        F.col("j").cast("string"), F.lit(":"), F.col("event_type")
                    )
                )
                % _SCMS_W
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )
    cells = run_to_batch(
        cells_stream, "stream_cms_event_counters_sink", state_partitions=8
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    probe = exact.select(
        "event_type",
        "exact_cnt",
        F.explode(F.expr(f"sequence(0, {_SCMS_D - 1})")).alias("j"),
    ).select(
        "event_type",
        "exact_cnt",
        "j",
        (
            spark_hex40(
                F.concat(F.col("j").cast("string"), F.lit(":"), F.col("event_type"))
            )
            % _SCMS_W
        ).alias("bucket"),
    )
    return (
        probe.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("event_type")
        .agg(
            F.max("exact_cnt").cast("long").alias("exact_cnt"),
            F.min("s").cast("long").alias("cms_est"),
            F.expr(
                "CAST((MIN(s) - MAX(exact_cnt)) * 1000000"
                " DIV MAX(exact_cnt) AS BIGINT)"
            ).alias("over_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time-correct SCD2 enrichment of a stream (r7) — the production
# pattern stream_static_enrichment (current-state lookup) deliberately
# does NOT cover: the dimension is SLOWLY CHANGING, and each event
# must join the version VALID AT ITS EVENT TIME, not the current one.
# Stream-static joins accept arbitrary predicates on the static side,
# so the validity-range condition (ts >= valid_from AND ts < valid_to)
# rides the same user_id equi-join — no watermark state needed for the
# join itself (the static SCD2 dim is re-resolvable per micro-batch).
# The dim here is deterministic: every user has tier version v0 before
# the mid-month flip and v1 after, tiers from the engine-neutral md5 —
# the oracle rebuilds both versions and the event-time routing exactly.
# 100 TB: the dim is |users|×2 rows (broadcastable per micro-batch or
# shuffle-joined on user_id); the rollup state is |tiers|×|types|.
# ---------------------------------------------------------------------------
_SCD2_FLIP = "2024-01-15"


@register(
    "stream_scd2_asof_enrichment",
    oracle=f"""
        WITH users AS (SELECT DISTINCT user_id FROM events),
        dim AS (
            SELECT user_id,
                   'T' || CAST(({sql_hex40("'tier0|' || CAST(user_id AS VARCHAR)")}) % 3 AS VARCHAR) AS tier,
                   TIMESTAMP '1970-01-01' AS valid_from,
                   TIMESTAMP '{_SCD2_FLIP}' AS valid_to
            FROM users
            UNION ALL
            SELECT user_id,
                   'T' || CAST(({sql_hex40("'tier1|' || CAST(user_id AS VARCHAR)")}) % 3 AS VARCHAR),
                   TIMESTAMP '{_SCD2_FLIP}',
                   TIMESTAMP '2100-01-01'
            FROM users
        )
        SELECT d.tier, e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events e
        JOIN dim d ON d.user_id = e.user_id
                  AND e.ts >= d.valid_from AND e.ts < d.valid_to
        GROUP BY 1, 2
    """,
    doc=(
        "Event-time-correct SCD2 enrichment of a stream: stream-static "
        "join carrying the validity-range predicate (each event joins "
        "the dim version valid AT ITS EVENT TIME), rolled up per "
        "(tier, event_type); deterministic two-version md5 dim."
    ),
)
def stream_scd2_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.sources.tables import load_table

    users = load_table(spark, sf_dir, "events").select("user_id").distinct()

    def version(v: int, start: str, end: str):
        return users.select(
            "user_id",
            F.concat(
                F.lit("T"),
                (
                    spark_hex40(
                        F.concat(F.lit(f"tier{v}|"), F.col("user_id"))
                    )
                    % 3
                ).cast("string"),
            ).alias("tier"),
            F.lit(start).cast("timestamp").alias("valid_from"),
            F.lit(end).cast("timestamp").alias("valid_to"),
        )

    dim = version(0, "1970-01-01", _SCD2_FLIP).unionByName(
        version(1, _SCD2_FLIP, "2100-01-01")
    )
    ev = load_events_stream(spark, sf_dir)
    enriched = ev.join(
        dim,
        (ev.user_id == dim.user_id)
        & (ev.ts >= dim.valid_from)
        & (ev.ts < dim.valid_to),
    )
    rollup = enriched.groupBy("tier", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
    )
    return run_to_batch(
        rollup, "stream_scd2_asof_enrichment_sink", state_partitions=8
    )
