"""Keyword extraction (reference data_transformer.py:301-318) as pure
column expressions.

The reference's ``_extract_keywords`` is a per-row Python helper: take
the first 5 topics lowercased, add any of a fixed tech-keyword list
found in the description, cap at 10. Re-expressed here as built-in
array/string functions — JVM-side, codegen'd, no UDF — with one
deliberate semantic pin: the reference accumulates into a ``set()``
(iteration order unspecified), while this version defines a
deterministic order (topics in input order first, then tech keywords in
list order, first occurrence wins) so results are stable across runs
and engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dt:310-312 — the fixed keyword vocabulary scanned for in descriptions
TECH_KEYWORDS = (
    "api",
    "framework",
    "library",
    "tool",
    "cli",
    "web",
    "mobile",
    "database",
    "ml",
    "ai",
    "data",
    "analytics",
    "microservice",
)

MAX_TOPICS = 5  # dt:306
MAX_KEYWORDS = 10  # dt:318


def extract_keywords(description: Column, topics: Column) -> Column:
    """array<string> of ≤10 keywords: ≤5 lowercased topics + matched
    tech keywords, deduplicated preserving first occurrence."""
    topk = F.slice(
        F.transform(
            F.coalesce(topics, F.array().cast("array<string>")),
            lambda t: F.lower(F.trim(t)),
        ),
        1,
        MAX_TOPICS,
    )
    desc = F.lower(F.coalesce(description, F.lit("")))
    hits = F.array_compact(
        F.array(*[F.when(desc.contains(k), F.lit(k)) for k in TECH_KEYWORDS])
    )
    return F.slice(F.array_distinct(F.concat(topk, hits)), 1, MAX_KEYWORDS)
