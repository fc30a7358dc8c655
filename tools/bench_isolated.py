"""Isolated benchmark for the pinned 29-query comparable subset — the
round-over-round performance metric (r9 verdict task 3).

In-session BENCH_FULL absolute values are contaminated by the 250+-
query session's heap/GC pressure (adjudicated r8→r9: the same code
read 20.1 s in-session vs 15.6 s isolated). This tool is the clean
protocol: each series run happens in its OWN fresh Python process with
nothing else on the box, using bench.py's exact measurement protocol
(q1 + python-worker warmup, clearCache per query, 1 cold +
median-of-3 warm).

Modes:

- ``python tools/bench_isolated.py [sf_dir]`` — 3-run series (each a
  fresh subprocess), writes ``BENCH_ISO.json`` at the repo root:
  per-run warm totals, the MEDIAN warm total (the official cross-round
  number, per BASELINE.md), and per-query median-across-runs.
- ``python tools/bench_isolated.py [sf_dir] --single`` — one in-process
  measurement pass, prints one JSON line (the subprocess worker; also
  the old r9 A/B behavior).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_single(sf_dir: str) -> dict:
    from bench import COMPARABLE
    from stacktrend_spark.operators.ranking import release_pinned
    from stacktrend_spark.plans.registry import all_queries
    from stacktrend_spark.session import get_spark

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
        release_pinned()
        t0 = time.time()
        specs[name].fn(spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        runs = []
        for _ in range(3):
            t1 = time.time()
            specs[name].fn(spark, sf_dir).count()
            runs.append(round(time.time() - t1, 3))
        warm[name] = sorted(runs)[1]
    return {
        "comparable_total": round(sum(cold.values()), 3),
        "comparable_warm_total": round(sum(warm.values()), 3),
        "queries_warm": warm,
        "sf_dir": sf_dir,
        "n": len(COMPARABLE),
    }


def run_series(sf_dir: str, n_runs: int = 3) -> dict:
    runs = []
    for i in range(n_runs):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, "--single"],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        runs.append(json.loads(line))
        print(
            f"run {i + 1}/{n_runs}: warm={runs[-1]['comparable_warm_total']}s "
            f"cold={runs[-1]['comparable_total']}s",
            file=sys.stderr,
        )
    warm_totals = sorted(r["comparable_warm_total"] for r in runs)
    cold_totals = sorted(r["comparable_total"] for r in runs)
    names = runs[0]["queries_warm"].keys()
    per_query = {
        name: sorted(r["queries_warm"][name] for r in runs)[len(runs) // 2]
        for name in names
    }
    return {
        "metric": "comparable_warm_median_isolated",
        "value": warm_totals[len(warm_totals) // 2],
        "unit": "sec",
        "series_warm": warm_totals,
        "series_cold": cold_totals,
        "queries_warm_median": per_query,
        "sf_dir": sf_dir,
        "n_queries": runs[0]["n"],
        "n_runs": n_runs,
        "protocol": (
            "each run = fresh process, q1 + python-worker warmup, "
            "clearCache per query, 1 cold + median-of-3 warm; official "
            "cross-round number = median of run warm totals (BASELINE.md)"
        ),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--single"]
    single = "--single" in sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    if single:
        print(json.dumps(run_single(sf_dir)))
        return
    result = run_series(sf_dir)
    out_path = os.path.join(REPO, "BENCH_ISO.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "queries_warm_median"}))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
