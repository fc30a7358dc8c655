"""Deterministic domain fixtures (FIXTURES.md §1-5).

Seeded generators for the bronze tables — the reference's only fixture
mechanism pulls ~100 live repos from the GitHub API
(github_data_collector.py:127-186); ours is hermetic and reproducible:
fixed seed, pinned as_of_date, edge cases planted per FIXTURES.md
(null/empty names for the quarantine path, mixed-case languages, topics
carrying language names for the distribution expr, license variety,
pushed_at straddling the 90-day activity boundary).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from stacktrend_spark.pipelines.schemas import (
    BRONZE_ACTIVITY_SCHEMA,
    BRONZE_REPOS_SCHEMA,
)

AS_OF_DATE = "2025-08-01"
_AS_OF = datetime(2025, 8, 1)

_LANGUAGES = ["Python", "JavaScript", "Rust", "Go", None, "TypeScript", "java", " C++ "]
_TOPICS = [
    "python", "machine-learning", "llm", "rust", "webdev", "api",
    "database", "kubernetes", "security", "etl", "typescript", "devops",
    "javascript", "data-engineering", "monitoring", "compiler",
]
_LICENSES = ["MIT License", "Apache License 2.0", "GNU GPLv3", "BSD 3-Clause", "Custom", None]
_WORDS = ["spark", "data", "agent", "web", "infra", "tool", "lab", "kit", "flow", "hub"]


def bronze_repos_rows(n: int = 300, seed: int = 42) -> list[tuple]:
    """The raw seed rows, spark-free — the pipeline oracles embed these
    as a VALUES CTE so DuckDB recomputes the gold summary from the SAME
    input the Spark pipeline consumes (independent recomputation, not a
    pinned golden)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        repo_id = 1000 + i
        name = f"{rng.choice(_WORDS)}-{rng.choice(_WORDS)}-{i}"
        if i % 50 == 7:
            name = None  # quarantine: missing_name
        elif i % 50 == 8:
            name = "  "  # quarantine: blank name
        owner = f"owner{i % 40}"
        created = _AS_OF - timedelta(days=rng.randint(30, 2200))
        pushed = _AS_OF - timedelta(days=rng.randint(0, 400))
        updated = max(created, pushed - timedelta(days=rng.randint(0, 10)))
        stars = int(10 ** (rng.random() * 5)) + (0 if i % 37 else 0)
        if i % 61 == 3:
            stars = 0
        topics = rng.sample(_TOPICS, k=rng.randint(0, 6))
        rows.append(
            (
                repo_id,
                name,
                f"{owner}/{name}" if name else None,
                owner,
                "Organization" if i % 3 == 0 else "User",
                None
                if i % 5 == 0
                else f"A {rng.choice(_WORDS)} project, with [links](http://x) & punct!",
                created,
                updated,
                pushed,
                rng.choice(_LANGUAGES),
                stars,
                stars // 2,
                int(stars * rng.random() * 0.3),
                rng.randint(0, 50),
                0 if i % 29 == 5 else rng.randint(1, 500_000),
                "main",
                topics,
                rng.choice(_LICENSES),
                rng.random() < 0.5,
                rng.random() < 0.2,
                rng.random() < 0.05,
                False,
                _AS_OF,
                AS_OF_DATE,
            )
        )
    return rows


def bronze_repos(spark: SparkSession, n: int = 300, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(bronze_repos_rows(n, seed), BRONZE_REPOS_SCHEMA)


def bronze_activity_rows(
    repo_ids: list[int], n: int = 2000, seed: int = 42
) -> list[tuple]:
    rng = random.Random(seed + 1)
    rows = []
    for i in range(n):
        rid = rng.choice(repo_ids)
        atype = rng.choice(["commit", "issue", "release"])
        ts = _AS_OF - timedelta(days=rng.random() * 95)
        rows.append(
            (
                rid,
                atype,
                f"{atype}-{rid}-{i}",
                f"dev{rng.randint(0, 9)}",
                ts,
                f"{atype} #{i}",
                rng.randint(0, 500) if atype == "commit" else None,
                rng.randint(0, 200) if atype == "commit" else None,
                rng.randint(1, 20) if atype == "commit" else None,
                rng.choice(["open", "closed"]) if atype == "issue" else None,
                _AS_OF,
                AS_OF_DATE,
            )
        )
    return rows


def bronze_activity(
    spark: SparkSession, repo_ids: list[int], n: int = 2000, seed: int = 42
) -> DataFrame:
    return spark.createDataFrame(
        bronze_activity_rows(repo_ids, n, seed), BRONZE_ACTIVITY_SCHEMA
    )
