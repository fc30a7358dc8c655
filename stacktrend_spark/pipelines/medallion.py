"""Medallion storage layer: bronze/silver/gold namespaces over
partitioned parquet, with the reference's write policies.

The reference writes to per-layer Fabric lakehouses (settings.py:28-30)
with two write modes: full overwrite + overwriteSchema + partitionBy
(b2s:935-941 etc.) and SQL MERGE upserts (SURVEY §2.1 S10-S14). Here a
layer is a directory namespace; overwrite keeps the same
partitionBy("partition_date", ...) layout (partition pruning works
identically) and upserts run through operators/merge.py then rewrite —
on a Delta-enabled cluster the same call sites would emit MERGE INTO
with partition-aligned file skipping.

100 TB notes: writes always partitionBy partition_date (+ a secondary
dimension when the reference does) so daily reruns only touch one
partition; readers filter on partition_date and get directory-level
pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.operators.delta_backend import (
    delta_available,
    merge_into_delta,
)
from stacktrend_spark.operators.merge import (
    merge_full_sync,
    merge_insert_only,
    merge_preserve,
    merge_upsert,
)

LAYERS = ("bronze", "silver", "gold")


class MedallionStore:
    """``backend`` is "delta" when delta-spark is importable (storage
    merges run as true MERGE INTO — operators/delta_backend.py), else
    "parquet" (relational emulation + overwrite). Same API either way;
    pass ``backend="parquet"`` to force the emulation."""

    def __init__(self, root: str, backend: str | None = None):
        self.root = root
        self.backend = backend or ("delta" if delta_available() else "parquet")
        if self.backend not in ("delta", "parquet"):
            raise ValueError(f"unknown backend {self.backend!r}")

    def path(self, layer: str, table: str) -> str:
        if layer not in LAYERS:
            raise ValueError(f"unknown layer {layer!r}")
        return os.path.join(self.root, layer, table)

    def exists(self, layer: str, table: str) -> bool:
        return os.path.isdir(self.path(layer, table))

    def read(self, spark: SparkSession, layer: str, table: str) -> DataFrame:
        return spark.read.format(self.backend).load(self.path(layer, table))

    def overwrite(
        self, df: DataFrame, layer: str, table: str, partition_by: list[str] | None = None
    ) -> None:
        """Full overwrite (S10): mode=overwrite + partitionBy — the
        reference's overwriteSchema is implicit for parquet dirs and
        passed explicitly on the delta path.

        The write is preceded by an AQE REBALANCE (clustered by the
        partition columns when partitioned): output files come out at
        the advisory partition size regardless of the input's task
        layout — a 300-row bronze frame parallelized 32 ways lands as
        one file instead of 32, and a skewed partition at cluster
        scale is split rather than written as one giant file. The
        sizing follows spark.sql.adaptive.advisoryPartitionSizeInBytes,
        so the same code is right at sf0.001 and at 100 TB (r13
        optimization: the per-write task-commit overhead of 32 near-
        empty files dominated the medallion pipelines' wall time).
        """
        df = df.hint("rebalance", *partition_by) if partition_by else df.hint("rebalance")
        writer = df.write.format(self.backend).mode("overwrite")
        if self.backend == "delta":
            writer = writer.option("overwriteSchema", "true")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(self.path(layer, table))

    def upsert(
        self,
        spark: SparkSession,
        df: DataFrame,
        layer: str,
        table: str,
        keys: list[str],
        policy: str = "upsert",
        partition_by: list[str] | None = None,
        preserve_cols: list[str] | None = None,
        preserve_when=None,
        sync_scope=None,
        sync_scope_target_sql: str | None = None,
    ) -> None:
        """Keyed merge write (S11/S12/S14 + the r8 full-sync clause
        family). policy ∈ {upsert, insert_only, preserve, full_sync}.
        First write = plain write (the MERGE no-target case)."""
        if not self.exists(layer, table):
            # First write = MERGE against an empty target, so each
            # policy's no-target result must equal its merge result:
            # insert_only collapses duplicate keys, and full_sync
            # keeps only in-scope, key-unique source rows (NULL/FALSE
            # scope rows are ignored exactly as merge_full_sync and
            # the Delta builder do — a sync against a new table and
            # against an empty existing table now yield identical
            # contents).
            if policy == "insert_only":
                merged = df.dropDuplicates(keys)
            elif policy == "full_sync":
                if sync_scope is None:
                    raise ValueError("full_sync policy needs sync_scope")
                merged = df.filter(
                    F.coalesce(sync_scope, F.lit(False))
                ).dropDuplicates(keys)
            else:
                merged = df
        elif self.backend == "delta":
            # true MERGE INTO: transactional, file-skipping, no rewrite
            merge_into_delta(
                spark,
                self.path(layer, table),
                df,
                keys,
                policy=policy,
                preserve_cols=preserve_cols,
                preserve_when=preserve_when,
                sync_scope=sync_scope,
                sync_scope_target_sql=sync_scope_target_sql,
            )
            return
        else:
            target = self.read(spark, layer, table).select(*df.columns)
            if policy == "upsert":
                merged = merge_upsert(target, df, keys)
            elif policy == "insert_only":
                merged = merge_insert_only(target, df, keys)
            elif policy == "preserve":
                merged = merge_preserve(
                    target, df, keys, preserve_cols or [], preserve_when
                )
            elif policy == "full_sync":
                if sync_scope is None:
                    raise ValueError("full_sync policy needs sync_scope")
                merged = merge_full_sync(target, df, keys, sync_scope)
            else:
                raise ValueError(f"unknown merge policy {policy!r}")
        # parquet dirs can't be read and overwritten in one job —
        # materialize then rewrite (Delta MERGE removes this at scale)
        merged = merged.localCheckpoint(eager=True)
        self.overwrite(merged, layer, table, partition_by)
