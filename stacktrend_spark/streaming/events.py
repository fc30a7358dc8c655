"""Structured Streaming over the append-only events table.

The reference has no true streaming (SURVEY §2.10): its Data Factory
triggers approximate tumbling windows with scheduled batch reruns
(data_factory_pipelines.py:74-84,109-123), late/duplicate data with
idempotent keyed MERGE (github_data_ingestion.py:355-383) and
insert-only MERGE on event identity (personal_repos_ingestion.py:424-431),
and sliding aggregates with 7d/30d/90d lookback refilters
(personal_repos_bronze_to_silver.py:578-624). This module expresses
each of those semantics natively in Structured Streaming:

- tumbling / sliding window aggregations (``F.window``),
- session windows (``F.session_window``),
- insert-only-merge dedup (``withWatermark`` + ``dropDuplicates``),
- upsert sink (``foreachBatch`` + the merge operators).

100 TB notes: the streaming aggregations shuffle on (window, key) and
keep state per open window only; the watermark bounds state size, so a
1000-executor cluster holds |keys| x |open windows| rows of state, not
history. ``dropDuplicates`` state is likewise watermark-bounded. The
file source scales by listing only new files per trigger; on a real
deployment the same plans run unchanged on a Kafka source.

Batch twins of these plans are registered in
``plans/streaming_mirrors.py`` so the driver's DuckDB oracle can check
the streaming output values exactly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import LongType, StructField, StructType

from stacktrend_spark.functions.rounding import dsum

SESSION_GAP = "30 minutes"  # batch twin uses 30*60*1e6 µs (windows.py)


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with explicit schema.

    Streaming file sources cannot infer, and the testdata's ``ts``
    physical type has changed across driver rounds (TIMESTAMP(NANOS)
    read as int64 via nanosAsLong vs plain µs TIMESTAMP), so the schema
    is probed from the parquet footer with a batch read rather than
    declared statically. The probe reads metadata only — no data scan.
    """
    from stacktrend_spark.sources.tables import _ts_is_nanos

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    # probe the parquet LOGICAL type (footer only, no scan) — the same
    # guard as load_table: nanosAsLong must fire only for genuine
    # TIMESTAMP(NANOS) storage, never for a plain int64 column
    nanos = _ts_is_nanos(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(probed)
        # glob, not a literal file path: the file-stream source derives
        # basePath from a glob's parent dir, but rejects a plain file
        .parquet(f"{sf_dir.rstrip('/')}/events.parque*")
    )
    if nanos:
        # legacy nanos path: truncate to µs (lossless — data is µs-grained)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_counts(events: DataFrame, width: str = "1 day") -> DataFrame:
    """Tumbling event-time window per event_type: count + sum(value).

    The reference's scheduled 6h/daily batch reruns approximate exactly
    this (SURVEY §2.10); here it is a single incremental plan.
    """
    return (
        events.withWatermark("ts", width)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal-grained sum: bit-identical across engines
            # regardless of partial-agg order (functions/rounding.py)
            dsum("value", 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame, width: str = "2 days", slide: str = "1 day"
) -> DataFrame:
    """Sliding window per user — the streaming form of the reference's
    7d/30d/90d lookback loop (personal_repos_bronze_to_silver.py:578-624):
    each event lands in width/slide overlapping windows."""
    return (
        events.withWatermark("ts", width)
        .groupBy(F.window("ts", width, slide).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "user_id",
            "n_events",
        )
    )


def session_windows(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Event-time session windows per user (gap-close semantics).

    Batch twin: the lag + running-sum sessionization registered as
    ``sessionize_events`` (plans/windows.py) — same gap, same grouping.
    """
    return (
        events.withWatermark("ts", gap)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Insert-only-merge semantics as a stream: drop re-deliveries of
    the same event identity inside the watermark horizon — the
    streaming form of `MERGE WHEN NOT MATCHED THEN INSERT` on
    (activity_id, activity_type) (personal_repos_ingestion.py:424-431).
    Uses ``dropDuplicatesWithinWatermark`` (r8 review): plain
    dropDuplicates on a non-time key never evicts state — the map
    would grow forever on an unbounded stream (the hazard
    plans/streaming_mirrors.py documents) — whereas the
    within-watermark form holds exactly one horizon of ids at 100 TB."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


#: output/state schemas for the custom stateful operator below.
USER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
    ]
)
_USER_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event count, exact value total) carried in group
    state across micro-batches.

    This is the escape hatch for stateful semantics ``F.window``/
    ``session_window`` can't express (custom accumulators, ML feature
    state, CEP-ish logic). The value total is kept as scaled int64
    cents — exact under any batch/partition order (the same policy as
    functions/rounding.dsum), so the emitted totals are oracle-exact.

    Scale: state is one (n, cents) pair per user — O(|keys|), batches
    arrive Arrow-encoded, and the shuffle is the groupBy hash partition
    on user_id, identical to a batch aggregate's.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(
                np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64").sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [cents]}
        )

    # project BEFORE the Python stage: only (user_id, value) crosses the
    # Arrow boundary, not the full event row — at 100 TB that's the
    # difference between shuffling 2 columns and shuffling the table
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        USER_TOTALS_SCHEMA,
        _USER_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals as ``stateful_user_totals``, on
    Spark 4's ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState (SPARK-49474 arbitrary stateful processing
    v2): typed state handles (ValueState here; List/Map state and
    timers available), explicit init/close lifecycle, and a
    RocksDB-backed state store, which is the 100 TB answer — state
    spills to local SSD with changelog checkpointing instead of living
    in executor heap.

    Both implementations are kept deliberately: applyInPandasWithState
    is the stable API users run today; this is the migration target.
    Identical output lets the driver oracle pin them to the same
    values.
    """
    # the v2 state protocol speaks protobuf between the JVM state server
    # and the Python worker; without it the stream fails at runtime with
    # an opaque worker-init error — fail fast and clearly instead
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python worker environment; use stateful_user_totals "
            "(applyInPandasWithState) here instead"
        ) from e

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _USER_TOTALS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100.0 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [cents]}
            )

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store provider;
    # session-wide on purpose (same scope policy as the parity confs) —
    # HDFSBackedStateStore queries in the same session keep working on
    # RocksDB too.
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTotals(),
            outputStructType=USER_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_to_batch(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming plan to completion over the currently
    available input (``trigger(availableNow)``) into an in-memory sink
    and return the materialized result as a batch DataFrame.

    This is the bridge that lets the driver's batch-oriented oracle
    gate check streaming plans value-for-value.

    ``state_partitions`` right-sizes the stateful shuffle for the run:
    a stateful operator instantiates one state store PER shuffle
    partition, and store setup/commit dominates small runs (measured at
    sf0.1: the stream-stream interval join fell 8.7 s → 2.4 s going
    32 → 4 partitions, identical results). Spark pins a streaming
    query's state partitioning at first start, which is exactly why
    it's a per-query knob here — at cluster scale you size it to load
    once, up front. The session conf is restored after start.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        # must stay set for the WHOLE run: micro-batch planning reads
        # the conf lazily after start(), not at start. Restored after
        # termination; queries here run sequentially per session.
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_s)
            if not finished:
                # a timed-out query has committed only SOME micro-
                # batches — surfacing a partial table as the answer
                # would be silently wrong (r8 review)
                raise TimeoutError(
                    f"streaming query {name!r} did not finish within "
                    f"{timeout_s}s; partial results discarded"
                )
        finally:
            q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def upsert_sink(
    stream_df: DataFrame,
    merge_fn: Callable[[DataFrame], None],
    checkpoint_dir: str,
):
    """Upsert sink: each micro-batch is handed to ``merge_fn`` (wrap one
    of operators/merge.py's policies) — the Structured Streaming form of
    the reference's MERGE-on-key sinks (github_data_ingestion.py:355-383).
    Returns the started StreamingQuery."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_fn(batch_df)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_streams(
    purchases: DataFrame, views: DataFrame, lookback: str = "1 day"
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase pairs with
    the same user's view events from the trailing ``lookback`` window —
    the attribution join (which views preceded this purchase?).

    100 TB notes: both sides carry a watermark and the join condition
    bounds event-time distance, so Spark derives a state-eviction
    horizon for BOTH sides — state holds only the trailing window per
    side, not history. The join shuffles both streams on user_id once;
    output is append-mode (inner interval joins emit rows exactly when
    matched, never revised)."""
    p = purchases.withWatermark("ts", lookback).alias("p")
    v = views.withWatermark("ts", lookback).alias("v")
    joined = p.join(
        v,
        F.expr(
            "p.user_id = v.user_id"
            f" AND v.ts >= p.ts - INTERVAL {lookback}"
            " AND v.ts <= p.ts"
        ),
    )
    return joined.select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.user_id").alias("user_id"),
        (F.unix_micros("p.ts") - F.unix_micros("v.ts")).alias("gap_us"),
    )


def enrich_with_static(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Stream-static enrichment join: the streaming side joins a static
    dimension snapshot (re-read per micro-batch, so slowly-changing
    dims refresh without restarting the query). Spark plans the static
    side as a broadcast per batch — no stream-side state, no watermark
    needed for an inner equi-join against static data. Per-type rollup
    keeps the sink small; sums ride exact scaled ints."""
    from stacktrend_spark.functions.rounding import iscale

    joined = events.join(
        F.broadcast(customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")),
        "user_id",
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(iscale("value", 2)).alias("sum_cents"),
    )
