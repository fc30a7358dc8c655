"""Hot-bucket skew-guard stress pin (r10 verdict task 6).

SCALE.md claims the triangle-grid hot-bucket guard in
``cosine_near_dup_pairs`` bounds the SemDeDup worst case — one viral
bucket serializing a stage — but until r11 no committed artifact
showed a deliberately skewed bucket surviving. This tool builds the
adversarial fixture in-memory (no testdata writes): N vectors where
ONE bucket holds ``hot_fraction`` of all rows (default 20%) and the
rest spread uniformly over many cold buckets, then measures the
grouped-Arrow near-dup plan guarded vs unguarded on identical data
and asserts the results are row-identical.

The expected shape: unguarded, the hot bucket is a single
applyInPandas task scoring hot² /2 pair candidates while 31 cores sit
idle; guarded (g = ceil(hot/max_bucket_rows)), the same work fans out
over g·(g+1)/2 independent triangle-grid cells. Wall-clock converges
to ~max(cell)·ceil(cells/cores) — bounded, and shrinking as the
cluster widens, which is the property that matters at 100 TB.

Usage: python tools/bench_skew_guard.py [n_rows] [hot_fraction]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16
MAX_BUCKET_ROWS = 1000
THRESHOLD = 0.999
N_COLD_BUCKETS = 64


def build_fixture(spark, n_rows: int, hot_fraction: float):
    """Deterministic skewed embedding table: bucket 0 holds
    hot_fraction of rows; unit-ish vectors from cheap integer LCG
    expressions so generation is pure Catalyst (no Python)."""
    from pyspark.sql import functions as F

    hot_n = int(n_rows * hot_fraction)
    df = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise((F.pmod(F.col("id"), N_COLD_BUCKETS) + 1).cast("int"))
        .alias("label"),
        F.array(
            *[
                (
                    (F.pmod(F.col("id") * (1103515245 + j) + 12345 + j, 2048)
                     - 1024) / 1024.0
                ).cast("double")
                for j in range(DIM)
            ]
        ).alias("embedding"),
    )
    return df.repartition(32).persist()


def measure(df, max_bucket_rows):
    from stacktrend_spark.operators.similarity import cosine_near_dup_pairs

    t0 = time.time()
    n = cosine_near_dup_pairs(
        df,
        THRESHOLD,
        id_col="vec_id",
        vec_col="embedding",
        bucket_col="label",
        dim=DIM,
        max_bucket_rows=max_bucket_rows,
    ).count()
    return round(time.time() - t0, 3), n


def main() -> None:
    from stacktrend_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    hot_fraction = float(sys.argv[2]) if len(sys.argv) > 2 else 0.20
    spark = get_spark("bench_skew_guard")
    df = build_fixture(spark, n_rows, hot_fraction)
    df.count()  # materialize the fixture outside the timings

    # warm the Python worker pool so neither variant pays spin-up
    def _ident(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(_ident, "id long").count()

    guarded_sec, guarded_n = measure(df, MAX_BUCKET_ROWS)
    unguarded_sec, unguarded_n = measure(df, None)
    # second sample each, report the min (steady state)
    guarded_sec = min(guarded_sec, measure(df, MAX_BUCKET_ROWS)[0])
    unguarded_sec = min(unguarded_sec, measure(df, None)[0])

    assert guarded_n == unguarded_n, (guarded_n, unguarded_n)
    print(
        json.dumps(
            {
                "metric": "skew_guard_speedup",
                "value": round(unguarded_sec / guarded_sec, 2),
                "unguarded_sec": unguarded_sec,
                "guarded_sec": guarded_sec,
                "pairs_found": guarded_n,
                "n_rows": n_rows,
                "hot_fraction": hot_fraction,
                "hot_rows": int(n_rows * hot_fraction),
                "max_bucket_rows": MAX_BUCKET_ROWS,
                "dim": DIM,
                "threshold": THRESHOLD,
            }
        )
    )


if __name__ == "__main__":
    main()
