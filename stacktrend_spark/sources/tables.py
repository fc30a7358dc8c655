"""Parquet table loaders for the harness testdata.

Mirrors the reference's table-scan surface (SURVEY §2.1 S1/S2:
``spark.table`` / ``spark.read.format(...).load`` at
bronze_to_silver_transformation.py:639-641, silver_to_gold_analytics.py:91-96)
re-expressed as plain columnar parquet scans. Filters and projections
applied downstream reach the scan via Catalyst pushdown — callers
should NOT pre-collect or pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning + predicate pushdown
    happen automatically; keep this a bare scan.

    Parity confs are (re)applied here because the harness may hand us a
    SparkSession we didn't build: UTC session time zone (DuckDB
    timestamps are UTC-naive), and nanos-as-long for the ``events``
    table whose parquet carries TIMESTAMP(NANOS) — Spark can't read
    that natively, so we read nanos as int64 and truncate to
    microseconds (the testdata's timestamps are µs-grained, so this is
    lossless).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # make the package importable on executor Python workers regardless
    # of the driver process's cwd (see sources/shipping.py)
    from stacktrend_spark.sources.shipping import ship_package

    ship_package(spark)
    # Deliberately SESSION-WIDE (not per-read): the driver hands us its
    # own SparkSession and runs oracle-compared queries through it, so
    # every read in that session must see the same timestamp semantics.
    # UTC session zone (DuckDB timestamps are UTC-naive) and no-NTZ
    # inference affect only how naive parquet timestamps are surfaced —
    # any unrelated read in the same session inherits UTC semantics too,
    # which is this engine's documented policy (same as session.py).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # testdata parquet stores µs timestamps without isAdjustedToUTC; Spark 4
    # would infer TIMESTAMP_NTZ, which unix_micros()/window() reject. Read as
    # plain TIMESTAMP instead — under the UTC session zone the epoch values
    # are identical to DuckDB's naive-timestamp reading.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events" and _ts_is_nanos(path):
        # TIMESTAMP(NANOS) physical type (round-1 testdata): Spark can't
        # read it natively; read nanos as int64 and truncate to µs
        # (lossless — the data is µs-grained)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        # integer division: epoch-nanos (~1.7e18) exceeds double's 2^53
        # mantissa, so a float divide here would be off by ±1 µs
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def _ts_is_nanos(path: str) -> bool:
    """Probe the parquet LOGICAL type of events.ts via the footer.

    The nanosAsLong branch must fire only for genuine TIMESTAMP(NANOS)
    physical storage. Probing Spark's inferred dtype for ``bigint`` was
    ambiguous: a future regeneration storing ts as a true INT64 µs
    column would also read as bigint and the ÷1000 would silently
    corrupt timestamps 1000×. pyarrow reads metadata only — no scan.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    if _os.path.isdir(path):
        # Spark-style directory dataset: probe the first part file (all
        # parts share one schema) — read_schema on the dir itself raises
        parts = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if not parts:
            return False
        path = parts[0]
    try:
        field = pq.read_schema(path).field("ts")
    except (KeyError, OSError):
        return False
    return str(field.type) == "timestamp[ns]"


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition after a narrow scan, for CPU-heavy
    per-row work (md5 sketching, dot products).

    Local-scale artifact with a real rationale: the harness testdata is
    single-row-group parquet, so Spark's scan yields ONE partition and
    narrow projections serialize on one core. At 100 TB a table has
    thousands of row groups and the scan parallelizes naturally — this
    becomes a no-op (guarded below), which is why it lives here and not
    inside the operators."""
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (SURVEY §2.1 S13 —
    createOrReplaceTempView at github_data_ingestion.py:352 etc.) so
    SQL-path queries can run against the same inputs."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
