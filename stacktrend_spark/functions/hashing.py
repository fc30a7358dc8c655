"""Engine-neutral 40-bit hashing.

The correctness gate needs hash values that BOTH Spark and DuckDB can
rebuild bit-for-bit: md5 of the same string bytes, first 10 hex chars
(40 bits) parsed as int64. The SQL twin parses hex via a per-nibble
STRPOS fold — version-neutral across DuckDB builds (PARITY.md; the
'0x…' VARCHAR→BIGINT cast is a ≥0.10 extension).

Used by the sketch family (plans/sketches.py), synthetic geo
coordinates (plans/geo.py), and any operator whose buckets/salts must
be reproducible in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_hex40(expr: str) -> str:
    """DuckDB: first 40 md5 bits of ``expr`` as a non-negative BIGINT."""
    hx = f"SUBSTR(md5({expr}), 1, 10)"
    # parenthesized so embedding next to a higher-precedence operator
    # (e.g. "% 5") can never bind to just the last term (r8 review)
    return "(" + " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({hx}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (9 - i)} AS BIGINT)"
        for i in range(10)
    ) + ")"


def spark_hex40(col: Column) -> Column:
    """Spark twin of :func:`sql_hex40` (identical md5 input bytes)."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 10), 16, 10
    ).cast("long")
