"""Property-based tests for the skew-mitigation operators (r12) —
salted aggregation / salted join must be ROW-IDENTICAL to their plain
forms on arbitrary inputs.

operators/skew.py promises exact equivalence ("The result is
row-identical to df.groupBy(keys).agg(...)") — the property the whole
salting technique rests on: the salt changes the SHUFFLE, never the
answer. Random inputs probe the places fixtures don't: NULL keys and
NULL sum values (sum partials must not turn absent-in-a-salt-bucket
into zeros), duplicate rows, hot keys spread across every salt
bucket, unmatched join keys under every supported join type, and
bucket counts of 1 (degenerate) and 16.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from stacktrend_spark.operators.skew import salted_count_sum, salted_join

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key = st.one_of(st.none(), st.integers(0, 3))
_val = st.one_of(st.none(), st.integers(-100, 100))
_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _key, _val), min_size=1, max_size=40
)


@_SETTINGS
@given(rows=_rows, buckets=st.sampled_from([1, 3, 16]))
def test_salted_count_sum_equals_plain(spark, rows, buckets):
    df = spark.createDataFrame(rows, "rid long, k long, v long")
    salted = salted_count_sum(
        df, ["k"], F.col("rid"), {"sum_v": F.col("v")}, buckets=buckets
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    got = {r["k"]: (r["n_rows"], r["sum_v"]) for r in salted.collect()}
    want = {r["k"]: (r["n_rows"], r["sum_v"]) for r in plain.collect()}
    assert got == want


_small = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 9)), max_size=6
)


@_SETTINGS
@given(
    rows=_rows,
    small=_small,
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    buckets=st.sampled_from([1, 4]),
)
def test_salted_join_equals_plain(spark, rows, small, how, buckets):
    big = spark.createDataFrame(
        [(rid, k if k is not None else 99, v) for rid, k, v in rows],
        "rid long, k long, v long",
    )
    # small side key-unique (the dimension contract); payload column
    # distinguishes which replica matched
    sm = spark.createDataFrame(
        list({k: (k, p) for k, p in small}.values()), "k long, p long"
    )
    got = Counter(tuple(r) for r in salted_join(
        big, sm, "k", F.col("rid"), buckets=buckets, how=how
    ).collect())
    want = Counter(tuple(r) for r in big.join(sm, "k", how).collect())
    assert got == want
