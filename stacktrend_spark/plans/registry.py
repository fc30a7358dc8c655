"""Query registry: the engine's declared query inventory.

Every operator/query from SURVEY §2 that we implement registers here as
a (Spark callable, ANSI-SQL oracle) pair. The driver's correctness gate
runs both sides at sf0.01 and hash-matches values, so:

- every computed/aggregate column is ALIASED identically on both sides;
- computed doubles are ROUNDed (identically on both sides) so the two
  engines produce bit-identical values;
- every ranking/limit has a unique-key tiebreaker so the selected row
  SET is deterministic across engines;
- queries with genuinely non-SQL-expressible semantics register with
  ``oracle=None`` (driver records a weaker rows-only check).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

#: plan modules that populate the registry on import
_PLAN_MODULES = (
    "stacktrend_spark.plans.relational",
    "stacktrend_spark.plans.windows",
    "stacktrend_spark.plans.scalars",
    "stacktrend_spark.plans.merge_shapes",
    "stacktrend_spark.plans.gold_mirrors",
    "stacktrend_spark.plans.northstar",
    "stacktrend_spark.plans.streaming_mirrors",
    "stacktrend_spark.plans.statistics",
    "stacktrend_spark.plans.temporal",
    "stacktrend_spark.plans.mlprep",
    "stacktrend_spark.plans.skew",
    "stacktrend_spark.plans.python_api",
    "stacktrend_spark.plans.behavioral",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
