"""Cross-engine deterministic rounding.

The driver hash-compares Spark results against DuckDB results, but
Spark's ``round`` is HALF_UP while DuckDB's is HALF_EVEN — a computed
double landing exactly on a half boundary hashes differently. Both
sides therefore round through the same IEEE-exact formula
``floor(x * 10^n + 0.5) / 10^n``: multiply, add, floor and divide are
all bit-identical double ops in both engines, so the rounded values
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column | str, n: int) -> Column:
    """Spark-side deterministic round-half-up-to-n-decimals."""
    c = F.col(col) if isinstance(col, str) else col
    k = float(10**n)
    return F.floor(c * F.lit(k) + F.lit(0.5)) / F.lit(k)


def sql_round(expr: str, n: int) -> str:
    """Same formula as ``fround`` rendered as ANSI SQL for the oracle."""
    k = float(10**n)
    return f"FLOOR(({expr}) * {k} + 0.5) / {k}"


# ---------------------------------------------------------------------------
# Exact decimal-grained aggregation.
#
# The testdata's numeric columns are d-decimal-grained (prices/balances/
# values: 2 decimals; quantity: integers). Double summation order differs
# between Spark (partial aggs per partition) and DuckDB, so raw double
# sums can differ by an ulp — and because the data is decimal-grained the
# true sums sit EXACTLY on rounding boundaries, where an ulp flips the
# rounded value. Summing scale-10^d integers instead is exact and
# order-independent, so both engines produce bit-identical doubles.
#
# Overflow headroom: int64 holds 9.2e18; a 2-decimal sum overflows only
# past ~9e16 currency units — far beyond any oracle-checked scale. (At
# true 100 TB scale you'd use DecimalType throughout; these helpers are
# parity machinery for the correctness gate, not the engine's numeric
# policy.)
# ---------------------------------------------------------------------------


def iscale(col: Column | str, d: int = 2) -> Column:
    """Spark: decimal-grained double → exact scaled int64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(10**d)) + F.lit(0.5)).cast("long")


def sql_iscale(expr: str, d: int = 2) -> str:
    return f"CAST(FLOOR(({expr}) * {float(10 ** d)} + 0.5) AS BIGINT)"


def dsum(col: Column | str, d: int = 2) -> Column:
    """Spark: exact sum of a d-decimal column, returned as double."""
    return F.sum(iscale(col, d)) / F.lit(float(10**d))


def sql_dsum(expr: str, d: int = 2) -> str:
    return f"CAST(SUM({sql_iscale(expr, d)}) AS DOUBLE) / {float(10 ** d)}"


def davg(col: Column | str, d: int = 2, n: int = 6) -> Column:
    """Spark: exact-numerator average of a d-decimal column, rounded to
    n decimals via the shared deterministic formula."""
    c = F.col(col) if isinstance(col, str) else col
    return fround(dsum(c, d) / F.count(c), n)


def sql_davg(expr: str, d: int = 2, n: int = 6) -> str:
    return sql_round(f"{sql_dsum(expr, d)} / COUNT({expr})", n)
