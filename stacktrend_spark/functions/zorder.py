"""Z-order (Morton) interleave keys for multi-dimensional clustering.

At 100 TB, min/max data skipping only prunes on the SORT column; a
table queried by BOTH user and time needs its rows clustered so that
each file covers a small rectangle of (user, day) space. Sorting by
the Z-order key — the bitwise interleave of the two dimensions — gives
exactly that: consecutive key ranges map to bounded ranges in EVERY
interleaved dimension, so parquet footer stats prune on either
predicate. This is the mechanism behind Delta OPTIMIZE ZORDER BY;
here it is a plain deterministic column expression usable with
``sortWithinPartitions``/``repartitionByRange`` before any write.

Pure integer bit ops (shift/and/or) — bit-identical in every engine,
hence oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    x's bit i lands at position 2i, y's at 2i+1. 2·bits ≤ 63."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        acc = acc + xb + yb  # disjoint bit positions: + is |
    return acc


def sql_zorder_key2(x: str, y: str, bits: int = 16) -> str:
    """The same interleave rendered as ANSI SQL for the oracle."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
