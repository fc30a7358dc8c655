"""Skew mitigation: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (a viral repo's events, an 'en'
language bucket, a null-ish default) can hold 100× the median key's
rows; a plain hash shuffle sends each whole key to ONE reduce task, so
the stage runs as slow as its hottest key. Two classic remedies, both
pure DataFrame compositions:

- **Salted aggregation**: append a deterministic salt in [0, B) →
  aggregate (key, salt) — the hot key spreads across B tasks → strip
  the salt with a second, tiny aggregate over partial results. Only
  works for decomposable aggregates (sum/count/min/max and anything
  expressible in partials); the second shuffle moves |keys|·B rows, not
  data.
- **Salted join**: salt the big side's rows; replicate the small side
  B× (one copy per salt value); equi-join on (key, salt). Row volume
  on the small side grows B× — acceptable because it is small; the big
  side's hot key now hash-partitions into B tasks.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
join skew automatically at runtime; explicit salting remains the tool
for AGGREGATION skew and for cases where the optimizer can't see the
skew (e.g. freshly shuffled intermediate results without stats).

The salt must be DETERMINISTIC (hash of a stable column, not rand())
or re-runs and retried tasks place rows differently — fine for a join,
fatal for idempotent-write pipelines and for golden tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_src: Column, buckets: int) -> DataFrame:
    """Append a deterministic salt column in [0, buckets) derived from
    a stable per-row expression (e.g. a unique id)."""
    return df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(buckets)))


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    salt_src: Column,
    sum_cols: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted count + sums per key.

    ``sum_cols`` maps output name → column expression; every aggregate
    here is decomposable, so phase-2 just sums phase-1 partials. The
    result is row-identical to ``df.groupBy(keys).agg(...)``.
    """
    salted = with_salt(df, salt_src, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_pn"),
        *[F.sum(expr).alias(f"_ps_{name}") for name, expr in sum_cols.items()],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pn").alias("n_rows"),
        *[F.sum(f"_ps_{name}").alias(name) for name in sum_cols],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: Column,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side with a small side via salting.

    The big side gets a deterministic salt; the small side is
    replicated once per salt value (explode of a literal range — B×
    |small| rows, still broadcastable). The (key, salt) equi-join then
    spreads each hot key over ``buckets`` tasks. Result is identical to
    ``big.join(key, how)`` for BIG-SIDE-PRESERVING joins only: the
    replicated small side makes right/full outer joins emit up to
    ``buckets`` spurious null-extended rows per small row, so those
    hows are rejected (r8 review) — salt the other side instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti",
                   "cross", "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side "
            "is replicated per salt, so right/full outer joins would "
            "emit duplicate null-extended rows for unmatched replicas"
        )
    b = with_salt(big, salt_src, buckets)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(F.broadcast(s), [key, "_salt"], how).drop("_salt")
