"""Custom Python DataSource (Spark 4 Python Data Source API).

The reference ingests REST feeds by collecting pages on the driver and
parallelizing rows (sources/rest.py mirrors that, citing
github_api_client.py). Spark 4's ``pyspark.sql.datasource`` API is the
native way to make such a feed a FIRST-CLASS table: the source
declares its schema and its partitions, and every partition's
``read()`` runs ON AN EXECUTOR — ingestion parallelism without any
driver-side row materialization, with column pruning and (4.1+) filter
pushdown hooks available.

``SyntheticFeedDataSource`` is the deterministic stand-in for such a
feed (the sandbox has no network): _N_ROWS records across
_N_PARTITIONS executor-side generators, every field derived from the
engine-neutral 40-bit md5 of the row id — so a DuckDB oracle rebuilds
the entire feed closed-form and the correctness gate value-checks a
PYTHON-DEFINED source end to end.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_ROWS = 10_000
N_PARTITIONS = 8
KINDS = ("push", "fork", "star", "issue", "release")


def hex40(s: str) -> int:
    """First 40 md5 bits of ``s`` — must stay bit-identical to
    functions/hashing.spark_hex40 / sql_hex40 (same md5, same slice)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


class _FeedPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticFeedReader(DataSourceReader):
    def partitions(self):
        step = N_ROWS // N_PARTITIONS
        return [
            _FeedPartition(i * step, N_ROWS if i == N_PARTITIONS - 1 else (i + 1) * step)
            for i in range(N_PARTITIONS)
        ]

    def read(self, partition: _FeedPartition):
        # runs on the executor: each partition generates its id range
        for i in range(partition.start, partition.end):
            h = hex40(f"feed|{i}")
            yield (i, KINDS[h % len(KINDS)], (h // 7) % 100_000)


class SyntheticFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_feed"

    def schema(self) -> str:
        return "event_id bigint, kind string, score_cents bigint"

    def reader(self, schema) -> SyntheticFeedReader:
        return SyntheticFeedReader()
