"""Isolated benchmark for the pinned cross-round subsets — the
round-over-round performance metric (r9 verdict task 3; r10 verdict
tasks 2+3).

In-session BENCH_FULL absolute values are contaminated by the 250+-
query session's heap/GC pressure (adjudicated r8→r9: the same code
read 20.1 s in-session vs 15.6 s isolated). This tool is the clean
protocol: each series run happens in its OWN fresh Python process with
nothing else on the box, using bench.py's exact measurement protocol
(q1 + python-worker warmup, clearCache+release_pinned per query,
1 cold + median-of-3 warm).

Two pinned subsets, reported as separate totals:

- ``COMPARABLE`` (29 rows, membership pinned since r1, defined in
  bench.py) — the official cross-round number;
- ``SCALE_OPS`` (8 rows, pinned r11 per the r10 verdict: the
  comparable subset shares zero queries with the two-phase ranking
  operator family, so regressions in ``operators/ranking.py`` and the
  nine r10-converted queries were invisible to the official metric).

De-noising (r10 verdict task 3 — the same code measured 15.7/19.9/
17.6 s warm in ONE day, a ±13% box envelope larger than most real
round-over-round deltas):

- a fixed COOLDOWN idle gap runs before EVERY series subprocess (the
  r10 envelope's outlier series started right after 20 min of gates;
  the accidental discovery was that a cooled box measures tight);
- beside the raw median, the artifact reports an ANCHOR-NORMALIZED
  total: raw total divided by the box factor, where the box factor is
  the median of (this run's anchor warm / the anchor's committed r10
  reference). The four anchors are stable, code-frozen-since-r1
  queries spanning scan/join/agg shapes; a run on a slow day inflates
  anchors and subjects alike, so the normalized number cancels the
  box. BASELINE.md states which number is the cross-round metric.

Modes:

- ``python tools/bench_isolated.py [sf_dir]`` — 3-run series (each a
  fresh subprocess after a cooldown), writes ``BENCH_ISO.json``:
  per-run warm totals for BOTH subsets, the MEDIAN warm totals, the
  anchor-normalized totals, and per-query medians.
- ``python tools/bench_isolated.py [sf_dir] --single`` — one
  in-process measurement pass, prints one JSON line (the subprocess
  worker; also the old r9 A/B behavior).
- ``--cooldown N`` — idle seconds before each series run (default 60;
  0 disables, e.g. for quick smoke checks).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the two-phase-ranking-operator bench subset (r10 verdict task 2).
#: Membership is PINNED — additions would break cross-round
#: comparability; new scale operators get their own subset instead.
SCALE_OPS = (
    "feature_quantile_bins",
    "model_gains_deciles",
    "vocab_coverage_curve",
    "skyline_price_size",
    "pack_sequences",
    "quality_budget_cut",
    "rank_global_scalable",
    "conversion_latency_quantiles",
)

#: anchor queries for box-factor normalization: code frozen since r1,
#: cheap, spanning scan+agg / shuffle-join / multi-join-gold /
#: hash-dedup shapes. Reference values = the committed r10 BENCH_ISO
#: per-query warm medians (the first isolated-series artifact).
ANCHOR_REF = {
    "q1_pricing_summary": 0.610,
    "join_revenue_by_nation": 0.790,
    "gold_tech_metrics": 0.709,
    "dedup_exact": 0.214,
}

DEFAULT_COOLDOWN = 60


def _measure(spark, specs, names, sf_dir):
    from stacktrend_spark.operators.ranking import release_pinned

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
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
    return cold, warm


def run_single(sf_dir: str) -> dict:
    from bench import COMPARABLE
    from stacktrend_spark.plans.registry import all_queries
    from stacktrend_spark.session import get_spark

    spark = get_spark("bench_isolated")
    specs = all_queries()
    specs["q1_pricing_summary"].fn(spark, sf_dir).count()

    def _ident(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(_ident, "id long").count()

    cold, warm = _measure(spark, specs, COMPARABLE, sf_dir)
    so_cold, so_warm = _measure(spark, specs, SCALE_OPS, sf_dir)
    return {
        "comparable_total": round(sum(cold.values()), 3),
        "comparable_warm_total": round(sum(warm.values()), 3),
        "scale_ops_total": round(sum(so_cold.values()), 3),
        "scale_ops_warm_total": round(sum(so_warm.values()), 3),
        "queries_warm": {**warm, **so_warm},
        "sf_dir": sf_dir,
        "n": len(COMPARABLE),
        "n_scale_ops": len(SCALE_OPS),
    }


def box_factor(queries_warm: dict[str, float]) -> float:
    """Median of per-anchor (measured / reference) ratios — >1 means
    the box ran slow that day; dividing totals by it cancels the
    day."""
    ratios = sorted(
        queries_warm[name] / ref
        for name, ref in ANCHOR_REF.items()
        if name in queries_warm
    )
    if not ratios:
        raise ValueError(
            "no anchor queries in queries_warm — normalization would "
            "silently disable; anchors: " + ", ".join(sorted(ANCHOR_REF))
        )
    mid = len(ratios) // 2
    if len(ratios) % 2:
        return ratios[mid]
    return (ratios[mid - 1] + ratios[mid]) / 2.0


def run_series(sf_dir: str, n_runs: int = 3, cooldown: int = DEFAULT_COOLDOWN) -> dict:
    runs = []
    for i in range(n_runs):
        if cooldown:
            print(f"cooldown {cooldown}s before run {i + 1}...", file=sys.stderr)
            time.sleep(cooldown)
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
            f"scale_ops_warm={runs[-1]['scale_ops_warm_total']}s "
            f"box={box_factor(runs[-1]['queries_warm']):.3f}",
            file=sys.stderr,
        )
    warm_totals = sorted(r["comparable_warm_total"] for r in runs)
    cold_totals = sorted(r["comparable_total"] for r in runs)
    so_warm_totals = sorted(r["scale_ops_warm_total"] for r in runs)
    so_cold_totals = sorted(r["scale_ops_total"] for r in runs)
    norm_totals = sorted(
        round(r["comparable_warm_total"] / box_factor(r["queries_warm"]), 3)
        for r in runs
    )
    so_norm_totals = sorted(
        round(r["scale_ops_warm_total"] / box_factor(r["queries_warm"]), 3)
        for r in runs
    )
    names = runs[0]["queries_warm"].keys()
    per_query = {
        name: sorted(r["queries_warm"][name] for r in runs)[len(runs) // 2]
        for name in names
    }
    mid = len(runs) // 2
    return {
        "metric": "comparable_warm_median_isolated",
        "value": warm_totals[mid],
        "value_normalized": norm_totals[mid],
        "scale_ops_warm_median": so_warm_totals[mid],
        "scale_ops_warm_median_normalized": so_norm_totals[mid],
        "unit": "sec",
        "series_warm": warm_totals,
        "series_cold": cold_totals,
        "series_warm_normalized": norm_totals,
        "series_scale_ops_warm": so_warm_totals,
        "series_scale_ops_cold": so_cold_totals,
        "series_scale_ops_warm_normalized": so_norm_totals,
        "box_factors": sorted(
            round(box_factor(r["queries_warm"]), 3) for r in runs
        ),
        "anchor_ref": ANCHOR_REF,
        "queries_warm_median": per_query,
        "sf_dir": sf_dir,
        "n_queries": runs[0]["n"],
        "n_scale_ops": runs[0]["n_scale_ops"],
        "n_runs": n_runs,
        "cooldown_sec": cooldown,
        "protocol": (
            "each run = fresh process after a fixed cooldown, q1 + "
            "python-worker warmup, clearCache+release_pinned per query, "
            "1 cold + median-of-3 warm; official cross-round number = "
            "value_normalized (anchor-normalized median of run warm "
            "totals, BASELINE.md); raw value reported beside it"
        ),
    }


def main() -> None:
    argv = sys.argv[1:]
    single = "--single" in argv
    cooldown = DEFAULT_COOLDOWN
    if "--cooldown" in argv:
        i = argv.index("--cooldown")
        if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
            sys.exit("usage: bench_isolated.py [sf_dir] [--single] [--cooldown SECONDS]")
        cooldown = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if a != "--single"]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    if single:
        print(json.dumps(run_single(sf_dir)))
        return
    result = run_series(sf_dir, cooldown=cooldown)
    out_path = os.path.join(REPO, "BENCH_ISO.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "queries_warm_median"}))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
