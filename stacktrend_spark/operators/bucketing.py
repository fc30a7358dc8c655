"""Bucketed tables: the pre-shuffled co-located join.

At 100 TB the single most expensive recurring cost is re-shuffling the
same fact table on the same key for every join. Bucketing pays that
shuffle ONCE at write time: both tables are hash-partitioned into the
same number of buckets on the join key (and optionally sorted within
buckets), so every later equi-join on that key is planned WITHOUT an
Exchange — each task zips bucket i with bucket i.

SCALE.md ledger entry; the zero-Exchange plan shape is pinned in
``tests/test_plans.py::test_bucketed_join_has_no_exchange``.

Mechanics: Spark's bucketing metadata lives in the catalog, so bucketed
writes go through ``saveAsTable`` (the warehouse dir is pinned to a
temp location in ``session.get_spark``). Bucket counts must MATCH on
both sides (or be integer multiples with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND its warehouse location. A managed-table
    overwrite only cleans locations the current metastore knows about;
    an ephemeral (in-memory Derby) metastore orphans the directory on
    restart and the next ``saveAsTable`` fails with
    LOCATION_ALREADY_EXISTS. Deleting through the Hadoop FileSystem API
    keeps this correct on any storage, not just local disk."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(path, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    One shuffle now; zero shuffles for every future equi-join on
    ``keys`` against a same-bucketed table."""
    _drop_table_and_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.
    The merge hint forces a sort-merge join so the plan demonstrates
    the exchange-free shape even when one side would broadcast."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, keys, how)
