"""Delta Lake MERGE backend for the medallion store.

The reference's sinks are Delta ``MERGE INTO`` statements
(github_data_ingestion.py:355-383 plain upsert,
personal_repos_ingestion.py:424-431 insert-only,
bronze_to_silver_transformation.py:873-918 conditional-preserve). This
module carries that exact wiring behind the same
``MedallionStore.upsert`` API used by the relational emulation in
``operators/merge.py``:

- when ``delta-spark`` is importable (a real cluster / a container
  with the package), storage-level merges run as true ``MERGE INTO``
  via the DeltaTable builder API — file skipping, deletion vectors and
  transactional conflict detection come from Delta itself;
- when it isn't (this sandbox), callers fall back to the emulation +
  parquet overwrite path, which is semantically identical (proved by
  the oracle-checked ``merge_*`` queries).

Tests: ``tests/test_merge_backends.py`` runs the SAME idempotency
matrix against whichever backend is active, and delta-only assertions
skip cleanly when the package is absent.
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    """True when the delta-spark package is importable. The session
    must also carry the Delta SQL extension + catalog confs — a session
    built by ``get_spark`` sets them when the package is present."""
    return importlib.util.find_spec("delta") is not None


def delta_session_confs() -> dict[str, str]:
    """Builder confs a Delta-enabled session needs (delta-spark docs)."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def merge_into_delta(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    policy: str = "upsert",
    preserve_cols: list[str] | None = None,
    preserve_when: Column | None = None,
    sync_scope: Column | None = None,
    sync_scope_target_sql: str | None = None,
) -> None:
    """Run one of the three reference merge policies as a true Delta
    ``MERGE INTO`` against the table at ``path``.

    Matches ``operators/merge.py`` semantics exactly:

    - ``upsert``      — WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED
      INSERT * (gdi:355-383)
    - ``insert_only`` — WHEN NOT MATCHED INSERT * over a key-deduped
      source (pri:424-431)
    - ``preserve``    — first WHEN MATCHED clause (condition =
      ``preserve_when`` over ``t.*``) refreshes every column EXCEPT
      ``preserve_cols``; second unconditional clause updates all;
      unmatched rows insert (b2s:899-914)
    - ``full_sync``   — partition-scoped full synchronization (the
      fourth clause family, operators/merge.merge_full_sync): matched
      update, unmatched insert, and WHEN NOT MATCHED BY SOURCE AND
      <scope> THEN DELETE. ``sync_scope`` is the predicate over PLAIN
      column names (filters the feed to in-scope rows, matching the
      emulation); ``sync_scope_target_sql`` is the same predicate as
      SQL text over ``t.``-qualified names (the delete-clause and
      merge-on conjunct). A NULL scope never fires the delete —
      identical to the emulation's coalesce(scope, false). Same
      precondition as the emulation: in-scope source rows keyed to
      OUT-of-scope target rows produce duplicate keys.
    """
    from delta.tables import DeltaTable  # gated import

    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)

    if policy == "insert_only":
        source = source.dropDuplicates(keys)
    if policy == "full_sync":
        if sync_scope is None or not sync_scope_target_sql:
            raise ValueError(
                "full_sync policy needs sync_scope + sync_scope_target_sql"
            )
        source = source.filter(sync_scope).dropDuplicates(keys)
        cond = f"({cond}) AND ({sync_scope_target_sql})"

    builder = (
        DeltaTable.forPath(spark, path)
        .alias("t")
        .merge(source.alias("s"), cond)
    )
    if policy == "upsert":
        builder = builder.whenMatchedUpdateAll().whenNotMatchedInsertAll()
    elif policy == "insert_only":
        builder = builder.whenNotMatchedInsertAll()
    elif policy == "preserve":
        if not preserve_cols or preserve_when is None:
            raise ValueError("preserve policy needs preserve_cols + preserve_when")
        refresh = {
            c: F.col(f"s.{c}")
            for c in source.columns
            if c not in preserve_cols and c not in keys
        }
        builder = (
            builder.whenMatchedUpdate(condition=preserve_when, set=refresh)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
        )
    elif policy == "full_sync":
        builder = (
            builder.whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .whenNotMatchedBySourceDelete(condition=sync_scope_target_sql)
        )
    else:
        raise ValueError(f"unknown merge policy {policy!r}")
    builder.execute()
