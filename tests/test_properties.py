"""Property-based tests (SURVEY §5): the invariants the reference only
asserted informally become machine-checked properties — merge
idempotency, preservation semantics, score ranges, language-share
normalization, and cross-engine rounding parity.

Each example runs a real (tiny) Spark job; max_examples is kept small
so the suite stays fast while hypothesis still explores boundaries.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from stacktrend_spark.functions.langdist import language_distribution
from stacktrend_spark.functions.rounding import fround, sql_round
from stacktrend_spark.operators.merge import (
    merge_insert_only,
    merge_preserve,
    merge_upsert,
)
from stacktrend_spark.operators.text import quality_score

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
    min_size=1,
    max_size=12,
    unique_by=lambda r: r[0],
)


@_SETTINGS
@given(target=_rows, source=_rows)
def test_merge_upsert_idempotent(spark, target, source):
    """Applying the same source twice must equal applying it once —
    the guarantee that makes scheduled re-ingestion safe (gdi:355-383)."""
    t = spark.createDataFrame(target, "k int, v int")
    s = spark.createDataFrame(source, "k int, v int")
    once = merge_upsert(t, s, keys=["k"])
    twice = merge_upsert(once, s, keys=["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # keys are a superset union, values from source win
    expect = dict(target)
    expect.update(dict(source))
    assert dict(map(tuple, once.collect())) == expect


@_SETTINGS
@given(target=_rows, source=_rows)
def test_merge_insert_only_immutable(spark, target, source):
    """Insert-only merge (pri:424-431) never changes an existing row."""
    t = spark.createDataFrame(target, "k int, v int")
    s = spark.createDataFrame(source, "k int, v int")
    merged = dict(map(tuple, merge_insert_only(t, s, keys=["k"]).collect()))
    for k, v in target:
        assert merged[k] == v
    for k, v in source:
        assert k in merged


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10),
            st.floats(0.0, 1.0, allow_nan=False),
            st.floats(0.0, 1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda r: r[0],
    )
)
def test_merge_preserve_keeps_confident_labels(spark, rows):
    """Conditional-preserve merge (b2s:899-914): an existing
    confident (>= 0.8) classification survives the refresh."""
    t = spark.createDataFrame(
        [(k, "OldCat", c_old) for k, c_old, _ in rows],
        "k int, category string, confidence double",
    )
    s = spark.createDataFrame(
        [(k, "NewCat", c_new) for k, _, c_new in rows],
        "k int, category string, confidence double",
    )
    out = {
        r.k: (r.category, r.confidence)
        for r in merge_preserve(
            t,
            s,
            keys=["k"],
            preserve_cols=["category", "confidence"],
            preserve_when=F.col("t.confidence") >= 0.8,
        ).collect()
    }
    for k, c_old, c_new in rows:
        cat, conf = out[k]
        if c_old >= 0.8:
            assert cat == "OldCat" and conf == c_old
        else:
            assert cat == "NewCat" and conf == c_new


_word = st.text(alphabet="abcdefghij ", min_size=0, max_size=30)


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["Python", "Go", "", "null", "None", "C++"]),
            st.lists(
                st.sampled_from(
                    ["python-lib", "rust", "go-tool", "database", "web", "r", "ml"]
                ),
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_langdist_normalized(spark, rows):
    """Language shares are non-negative and sum to 100 ± rounding
    drift (b2s:441-443's normalization contract)."""
    df = spark.createDataFrame(
        [(i, lang, topics) for i, (lang, topics) in enumerate(rows)],
        "id int, language string, topics array<string>",
    )
    out = df.select(
        language_distribution(F.col("language"), F.col("topics")).alias("m")
    ).collect()
    for row in out:
        shares = list(row.m.values())
        assert all(s >= 0.0 for s in shares)
        assert abs(sum(shares) - 100.0) <= 0.05 * len(shares) + 1e-9


@_SETTINGS
@given(texts=st.lists(_word, min_size=1, max_size=6))
def test_quality_score_in_range(spark, texts):
    """Scores clamp to [0, 100] for arbitrary text (med:237-257's
    validation rule as a property)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts) if t.strip()], "doc_id int, text string"
    )
    if not df.count():
        return
    for r in quality_score(df, "doc_id", "text").collect():
        assert 0.0 <= r.quality_score <= 100.0
        assert r.quality_tier in ("high", "medium", "low")


@_SETTINGS
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=20,
    ),
    n=st.integers(0, 6),
)
def test_fround_matches_duckdb(spark, vals, n):
    """The shared deterministic rounding formula produces bit-identical
    doubles in Spark and DuckDB — the foundation of every oracle."""
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(fround(F.col("x"), n).alias("y")).collect()]
    con = duckdb.connect()
    expected = [
        con.execute(f"SELECT {sql_round('CAST(? AS DOUBLE)', n)}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# r5 Arrow-kernel bit-parity: the similarity kernels promise the EXACT
# left-fold summation order of the Catalyst/DuckDB column expressions
# (PARITY.md). These properties pin that promise against a pure-Python
# reference fold over arbitrary float32 inputs, including denormals,
# zeros and mixed magnitudes where summation order genuinely changes
# the bits.
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings, strategies as st


def _py_fold_dot(a, b):
    acc = float(np.float64(np.float32(a[0]))) * float(np.float64(np.float32(b[0])))
    for x, y in zip(a[1:], b[1:]):
        acc = acc + float(np.float64(np.float32(x))) * float(np.float64(np.float32(y)))
    return acc


_f32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_f32, _f32), min_size=1, max_size=64))
def test_seq_dot_matches_python_fold_bitwise(pairs):
    from stacktrend_spark.operators.similarity import _seq_dot

    a = np.array([p[0] for p in pairs], dtype=np.float32)
    b = np.array([p[1] for p in pairs], dtype=np.float32)
    A = a.astype(np.float64).reshape(1, -1)
    B = b.astype(np.float64).reshape(1, -1)
    got = _seq_dot(A, B)[0]
    want = _py_fold_dot(a.tolist(), b.tolist())
    assert got == want or (np.isnan(got) and np.isnan(want)), (got, want)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.lists(_f32, min_size=8, max_size=8), min_size=2, max_size=12)
)
def test_block_cosine_matches_per_pair_fold(vecs):
    """The grouped kernel's blockwise outer-product accumulation must be
    bit-identical to the per-pair fold for every (i, j) pair."""
    from stacktrend_spark.operators.similarity import _seq_dot

    M = np.array(vecs, dtype=np.float32).astype(np.float64)
    dim = M.shape[1]
    acc = np.multiply.outer(M[:, 0], M[:, 0])
    for j in range(1, dim):
        acc = acc + np.multiply.outer(M[:, j], M[:, j])
    nrm = np.sqrt(_seq_dot(M, M))
    with np.errstate(divide="ignore", invalid="ignore"):
        blockwise = acc / np.outer(nrm, nrm)
    for i in range(len(vecs)):
        for j in range(len(vecs)):
            d = _py_fold_dot(vecs[i], vecs[j])
            ni = np.sqrt(_py_fold_dot(vecs[i], vecs[i]))
            nj = np.sqrt(_py_fold_dot(vecs[j], vecs[j]))
            with np.errstate(divide="ignore", invalid="ignore"):
                want = d / (ni * nj)
            got = blockwise[i, j]
            assert got == want or (np.isnan(got) and np.isnan(want))
