"""Isolated A/B for the pinned 29-query comparable subset (r8 verdict
task 2): run ONLY the comparable queries, in a fresh process, with
nothing else on the box, using bench.py's exact measurement protocol
(q1 + python-worker warmup, clearCache per query, 1 cold + median-of-3
warm). Does NOT write BENCH_FULL.json — prints one JSON line so the
in-session full-bench numbers and the isolated numbers can be compared
side by side in SCALE.md.

Usage: python tools/bench_isolated.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import COMPARABLE  # noqa: E402
from stacktrend_spark.plans.registry import all_queries  # noqa: E402
from stacktrend_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("bench_isolated")
    specs = all_queries()
    specs["q1_pricing_summary"].fn(spark, sf_dir).count()

    def _ident(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(_ident, "id long").count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in COMPARABLE:
        spark.catalog.clearCache()
        t0 = time.time()
        specs[name].fn(spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        runs = []
        for _ in range(3):
            t1 = time.time()
            specs[name].fn(spark, sf_dir).count()
            runs.append(round(time.time() - t1, 3))
        warm[name] = sorted(runs)[1]
    print(
        json.dumps(
            {
                "comparable_total": round(sum(cold.values()), 3),
                "comparable_warm_total": round(sum(warm.values()), 3),
                "queries_warm": warm,
                "sf_dir": sf_dir,
                "n": len(COMPARABLE),
            }
        )
    )


if __name__ == "__main__":
    main()
