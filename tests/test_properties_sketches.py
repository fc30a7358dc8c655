"""Property-based tests for the sketch family (r11 verdict task 4) —
KMV / HLL / CMS / Bloom / bitmap / Misra-Gries on RANDOM streams.

The registered sketch plans (plans/sketches.py) are driver-proven
against DuckDB on the fixed testdata; this suite adds the randomized
leg with the batch-6/7 rigor used for the dedup candidate generators:

1. EXACT model equivalence: each registered plan runs unchanged on a
   hypothesis-generated table written to tmp parquet, and its full
   output must equal an independent Python recomputation (md5 hashing
   and all integer arithmetic replayed from scratch — not from the
   plan's own helpers).
2. Deterministic guarantees, asserted row-by-row on random streams:
   CMS one-sided error (estimate >= exact, always), Bloom
   no-false-negatives (the (member, not-positive) confusion cell is
   structurally empty), Misra-Gries survivor bound, KMV exactness
   below K, bitmap set algebra being EXACT.
3. Merge laws on the PROVEN model: KMV (K-smallest of union), HLL
   (register-wise max), CMS (bucket-wise sum) and bitmap (word-wise
   OR) merges are associative/commutative and equal the
   whole-stream sketch. Chained with (1), this proves the Spark
   sketches are mergeable — the property the 100 TB
   partial-aggregation path rests on — without a second Spark run.

Each model-equivalence example writes tmp parquet and runs real Spark
jobs; max_examples stays small (the merge-law tests are pure Python
and run more examples).
"""

from __future__ import annotations

import hashlib
import itertools
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from stacktrend_spark.plans.registry import all_queries

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
_FAST_SETTINGS = settings(max_examples=30, deadline=None)

_K = 64
_POW40 = 1 << 40
_HLL_M = 64
_HLL_ALPHA = 0.7093514624
_POW34 = 1 << 34
_POW35 = 1 << 35
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(_POW35)
_CMS_D, _CMS_W, _CMS_MIN = 4, 256, 45
_BLOOM_M = 63 * 64
_MG_K = 8


def _hex40(s: str) -> int:
    """Independent replica of the engine-neutral 40-bit hash: first 10
    hex chars of md5(utf8), parsed base-16."""
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


# ---------------------------------------------------------------------------
# tmp-table plumbing: write hypothesis data as the real parquet layout
# ---------------------------------------------------------------------------


def _write(dirpath: str, name: str, cols: dict, schema: pa.Schema) -> None:
    pq.write_table(
        pa.table(cols, schema=schema), os.path.join(dirpath, f"{name}.parquet")
    )


_EVENTS_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)
_LINEITEM_SCHEMA = pa.schema(
    [
        ("l_orderkey", pa.int64()),
        ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()),
        ("l_returnflag", pa.string()),
    ]
)
_CUSTOMER_SCHEMA = pa.schema(
    [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
)
_ORDERS_SCHEMA = pa.schema(
    [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
)


def _events_dir(rows: list[tuple[int, str]]) -> str:
    d = tempfile.mkdtemp(prefix="sketchprop_")
    n = len(rows)
    _write(
        d,
        "events",
        {
            "event_id": list(range(n)),
            "ts": [1_700_000_000_000_000 + i for i in range(n)],
            "user_id": [u for u, _ in rows],
            "event_type": [t for _, t in rows],
            "value": [0.0] * n,
            "props": ["{}"] * n,
        },
        _EVENTS_SCHEMA,
    )
    return d


def _run(spark, name: str, d: str):
    try:
        return all_queries()[name].fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# events: few types, user ids colliding often; enough rows that KMV
# sometimes crosses K=64 distinct (estimate branch) and sometimes not
# (exact branch)
_etype = st.sampled_from(["click", "view", "buy"])
_events = st.lists(
    st.tuples(st.integers(0, 150), _etype), min_size=1, max_size=220
)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def _kmv_sketch(hashes: set[int]) -> list[int]:
    return sorted(hashes)[:_K]


def _kmv_estimate(sketch: list[int], n_distinct_hashes: int) -> int:
    if n_distinct_hashes < _K:
        return n_distinct_hashes
    return (_K - 1) * _POW40 // sketch[-1]


@_SETTINGS
@given(rows=_events)
def test_kmv_distinct_sketch_model(spark, rows):
    got = {
        r["event_type"]: (r["exact_users"], r["kmv_users"], r["err_ppm"])
        for r in _run(spark, "kmv_distinct_sketch", _events_dir(rows))
    }
    want = {}
    for t in {t for _, t in rows}:
        users = {u for u, tt in rows if tt == t}
        hashes = {_hex40(str(u)) for u in users}
        sk = _kmv_sketch(hashes)
        est = _kmv_estimate(sk, len(hashes))
        want[t] = (
            len(users),
            est,
            abs(est - len(users)) * 1_000_000 // len(users),
        )
    assert got == want
    # deterministic guarantee: below K the sketch IS the set — exact
    for t, (exact, est, ppm) in want.items():
        if exact < _K:
            assert ppm == 0 and est == exact


@_SETTINGS
@given(rows=_events)
def test_kmv_union_jaccard_model(spark, rows):
    got = {
        (r["type_a"], r["type_b"]): (
            r["union_users_est"],
            r["jaccard_ppm"],
            r["inter_users_est"],
        )
        for r in _run(spark, "kmv_union_jaccard", _events_dir(rows))
    }
    types = sorted({t for _, t in rows})
    want = {}
    for ta, tb in itertools.combinations(types, 2):
        ha = {_hex40(str(u)) for u, t in rows if t == ta}
        hb = {_hex40(str(u)) for u, t in rows if t == tb}
        union = sorted(ha | hb)[:_K]
        n = len(union)
        est = n if n < _K else (_K - 1) * _POW40 // union[-1]
        n_both = sum(1 for h in union if h in ha and h in hb)
        want[(ta, tb)] = (est, n_both * 1_000_000 // n, n_both * est // n)
    assert got == want


@_FAST_SETTINGS
@given(
    stream=st.lists(st.integers(0, 400), min_size=1, max_size=300),
    cut1=st.integers(0, 300),
    cut2=st.integers(0, 300),
)
def test_kmv_merge_laws(stream, cut1, cut2):
    """K-smallest-of-union merge: commutative, associative, and equal
    to the whole-stream sketch for ANY 3-way split — the identity that
    lets per-partition KMV partials combine in one shuffle."""
    a, b = sorted((cut1 % (len(stream) + 1), cut2 % (len(stream) + 1)))
    parts = [stream[:a], stream[a:b], stream[b:]]
    hs = [{_hex40(str(x)) for x in p} for p in parts]

    def merge(s1, s2):
        return sorted(set(s1) | set(s2))[:_K]

    s1, s2, s3 = (_kmv_sketch(h) for h in hs)
    whole = _kmv_sketch(hs[0] | hs[1] | hs[2])
    assert merge(merge(s1, s2), s3) == whole
    assert merge(s1, merge(s2, s3)) == whole
    assert merge(s2, s1) == merge(s1, s2)


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def _hll_registers(keys: set[str]) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in keys:
        hv = _hex40(k)
        j, rem = hv // _POW34, hv % _POW34
        rho = 35 if rem == 0 else 35 - rem.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def _hll_estimate(regs: dict[int, int]) -> int:
    denom_scaled = sum(_POW35 // (1 << m) for m in regs.values())
    import math

    return int(
        math.floor(
            _HLL_NUM
            / (float(denom_scaled) + float(_HLL_M - len(regs)) * float(_POW35))
        )
    )


# lineitem streams: orderkeys collide across flags; hot partkeys cross
# the CMS candidate threshold; few suppkeys so MG has survivors
_flag = st.sampled_from(["A", "N", "R"])


@st.composite
def _lineitem_rows(draw):
    n_hot = draw(st.integers(1, 3))
    hot = draw(
        st.lists(
            st.integers(0, 40), min_size=n_hot, max_size=n_hot, unique=True
        )
    )
    rows = []
    ok = 0
    for h in hot:
        reps = draw(st.integers(_CMS_MIN, _CMS_MIN + 15))
        for _ in range(reps):
            rows.append((ok, h, h % 7, ["A", "N", "R"][ok % 3]))
            ok += 1
    n_noise = draw(st.integers(0, 60))
    for _ in range(n_noise):
        rows.append(
            (
                draw(st.integers(0, 200)),
                draw(st.integers(41, 300)),
                draw(st.integers(0, 9)),
                draw(_flag),
            )
        )
    return rows


def _lineitem_dir(rows) -> str:
    d = tempfile.mkdtemp(prefix="sketchprop_")
    _write(
        d,
        "lineitem",
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
            "l_suppkey": [r[2] for r in rows],
            "l_returnflag": [r[3] for r in rows],
        },
        _LINEITEM_SCHEMA,
    )
    return d


@_SETTINGS
@given(rows=_lineitem_rows())
def test_hll_register_sketch_model(spark, rows):
    got = {
        r["l_returnflag"]: (r["exact_orders"], r["hll_orders"], r["err_ppm"])
        for r in _run(spark, "hll_register_sketch", _lineitem_dir(rows))
    }
    want = {}
    for flag in {r[3] for r in rows}:
        orders = {r[0] for r in rows if r[3] == flag}
        est = _hll_estimate(_hll_registers({str(o) for o in orders}))
        want[flag] = (
            len(orders),
            est,
            abs(est - len(orders)) * 1_000_000 // len(orders),
        )
    assert got == want


@_FAST_SETTINGS
@given(
    stream=st.lists(st.integers(0, 500), min_size=1, max_size=300),
    cut=st.integers(0, 300),
)
def test_hll_merge_laws(stream, cut):
    """Register-wise max merge equals the whole-stream registers (and
    is idempotent/commutative by max's algebra) — HLL partials combine
    losslessly."""
    c = cut % (len(stream) + 1)
    ka = {str(x) for x in stream[:c]}
    kb = {str(x) for x in stream[c:]}
    ra, rb = _hll_registers(ka), _hll_registers(kb)
    merged = {
        j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)
    }
    assert merged == _hll_registers(ka | kb)
    assert _hll_estimate(merged) == _hll_estimate(_hll_registers(ka | kb))


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------


def _cms_sketch(counts: dict[int, int]) -> dict[tuple[int, int], int]:
    sk: dict[tuple[int, int], int] = {}
    for key, cnt in counts.items():
        for j in range(_CMS_D):
            b = _hex40(f"{j}:{key}") % _CMS_W
            sk[(j, b)] = sk.get((j, b), 0) + cnt
    return sk


@_SETTINGS
@given(rows=_lineitem_rows())
def test_cms_heavy_hitters_model(spark, rows):
    got = {
        r["l_partkey"]: (r["exact_cnt"], r["cms_est"], r["over_ppm"])
        for r in _run(spark, "cms_heavy_hitters", _lineitem_dir(rows))
    }
    counts: dict[int, int] = {}
    for r in rows:
        counts[r[1]] = counts.get(r[1], 0) + 1
    sk = _cms_sketch(counts)
    want = {}
    for key, cnt in counts.items():
        if cnt < _CMS_MIN:
            continue
        est = min(sk[(j, _hex40(f"{j}:{key}") % _CMS_W)] for j in range(_CMS_D))
        want[key] = (cnt, est, (est - cnt) * 1_000_000 // cnt)
    assert got == want
    # deterministic guarantee: CMS error is ONE-SIDED (never under)
    for cnt, est, ppm in got.values():
        assert est >= cnt and ppm >= 0


@_FAST_SETTINGS
@given(
    stream=st.lists(st.integers(0, 50), min_size=0, max_size=200),
    cut=st.integers(0, 200),
)
def test_cms_merge_laws(stream, cut):
    """Bucket-wise sum merge: CMS(A) + CMS(B) == CMS(A ++ B) — the
    linearity that lets per-partition CMS partials combine, and the
    reason the plan may legally sketch the pre-aggregated count table
    instead of the raw stream."""
    c = cut % (len(stream) + 1)

    def counts(part):
        out: dict[int, int] = {}
        for x in part:
            out[x] = out.get(x, 0) + 1
        return out

    ca, cb, cw = counts(stream[:c]), counts(stream[c:]), counts(stream)
    sa, sb, sw = _cms_sketch(ca), _cms_sketch(cb), _cms_sketch(cw)
    merged = dict(sa)
    for k, v in sb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == sw


# ---------------------------------------------------------------------------
# Misra-Gries
# ---------------------------------------------------------------------------


@_SETTINGS
@given(rows=_lineitem_rows())
def test_misra_gries_summary_model(spark, rows):
    got = {
        r["l_suppkey"]: (
            r["exact_cnt"],
            r["mg_weight"],
            r["theta"],
            r["mg_bound_ok"],
        )
        for r in _run(spark, "misra_gries_summary", _lineitem_dir(rows))
    }
    counts: dict[int, int] = {}
    for r in rows:
        counts[r[2]] = counts.get(r[2], 0) + 1
    n_total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: _MG_K + 1]
    theta = min(c for _, c in top)
    want = {
        k: (c, c - theta, theta, c - theta >= c - n_total // (_MG_K + 1))
        for k, c in counts.items()
        if c > theta
    }
    assert got == want
    # structural guarantees: at most k survivors; every survivor's
    # weight undercounts its true frequency by at most theta
    assert len(got) <= _MG_K
    for exact, weight, th, _ok in got.values():
        assert 0 < weight == exact - th


# ---------------------------------------------------------------------------
# Bloom + bitmap
# ---------------------------------------------------------------------------

_seg = st.sampled_from(["BUILDING", "AUTOMOBILE", "MACHINERY"])
_customers = st.lists(
    st.tuples(st.integers(0, 300), _seg), min_size=1, max_size=120
)


def _bloom_bits(custkeys) -> dict[int, int]:
    words: dict[int, int] = {}
    for ck in custkeys:
        for i in range(3):
            pos = _hex40(f"bf{i}:{ck}") % _BLOOM_M
            words[pos // 63] = words.get(pos // 63, 0) | (1 << (pos % 63))
    return words


def _bloom_positive(words: dict[int, int], ck: int) -> bool:
    return all(
        (words.get((p := _hex40(f"bf{i}:{ck}") % _BLOOM_M) // 63, 0) >> (p % 63))
        & 1
        for i in range(3)
    )


@_SETTINGS
@given(cust=_customers)
def test_bloom_filter_membership_model(spark, cust):
    cust = list({ck: seg for ck, seg in cust}.items())  # custkey is a PK
    d = tempfile.mkdtemp(prefix="sketchprop_")
    _write(
        d,
        "customer",
        {"c_custkey": [c for c, _ in cust], "c_mktsegment": [s for _, s in cust]},
        _CUSTOMER_SCHEMA,
    )
    got = {
        (r["is_member"], r["bloom_positive"]): r["n_customers"]
        for r in _run(spark, "bloom_filter_membership", d)
    }
    words = _bloom_bits([c for c, s in cust if s == "BUILDING"])
    want: dict[tuple[bool, bool], int] = {}
    for ck, seg in cust:
        key = (seg == "BUILDING", _bloom_positive(words, ck))
        want[key] = want.get(key, 0) + 1
    assert got == want
    # no false negatives, ever
    assert (True, False) not in got


@_SETTINGS
@given(
    cust=_customers,
    orders=st.lists(st.integers(0, 350), min_size=1, max_size=150),
)
def test_bloom_prejoin_pruning_model(spark, cust, orders):
    cust = list({ck: seg for ck, seg in cust}.items())
    d = tempfile.mkdtemp(prefix="sketchprop_")
    _write(
        d,
        "customer",
        {"c_custkey": [c for c, _ in cust], "c_mktsegment": [s for _, s in cust]},
        _CUSTOMER_SCHEMA,
    )
    _write(
        d,
        "orders",
        {"o_orderkey": list(range(len(orders))), "o_custkey": orders},
        _ORDERS_SCHEMA,
    )
    [row] = _run(spark, "bloom_prejoin_pruning", d)
    members = {c for c, s in cust if s == "BUILDING"}
    words = _bloom_bits(members)
    passed = sum(1 for ck in orders if _bloom_positive(words, ck))
    joined = sum(1 for ck in orders if ck in members)
    n = len(orders)
    assert (
        row["rows_scanned"],
        row["rows_passed"],
        row["rows_joined"],
        row["false_passes"],
        row["pruned_ppm"],
    ) == (n, passed, joined, passed - joined, (n - passed) * 1_000_000 // n)
    # one-sided: the filter never drops a true member
    assert row["rows_joined"] <= row["rows_passed"]


@_SETTINGS
@given(rows=_events)
def test_bitmap_audience_overlap_model(spark, rows):
    """The bitmap index is EXACT set algebra: intersection/union sizes
    equal plain Python sets — no sketch error term at all."""
    got = {
        (r["type_a"], r["type_b"]): (r["n_both"], r["n_either"], r["jaccard_ppm"])
        for r in _run(spark, "bitmap_audience_overlap", _events_dir(rows))
    }
    types = sorted({t for _, t in rows})
    want = {}
    for ta, tb in itertools.combinations(types, 2):
        ua = {u for u, t in rows if t == ta}
        ub = {u for u, t in rows if t == tb}
        both, either = len(ua & ub), len(ua | ub)
        want[(ta, tb)] = (both, either, both * 1_000_000 // either)
    assert got == want


@_FAST_SETTINGS
@given(
    stream=st.lists(st.integers(0, 400), min_size=0, max_size=200),
    cut=st.integers(0, 200),
)
def test_bitmap_bloom_merge_laws(stream, cut):
    """Word-wise OR merge equals the whole-set words for both the
    bitmap index (63-bit user words) and the Bloom filter — OR's
    idempotent algebra is what makes both partial-aggregable."""
    c = cut % (len(stream) + 1)
    a, b = set(stream[:c]), set(stream[c:])

    def bitmap_words(users):
        words: dict[int, int] = {}
        for u in users:
            words[u // 63] = words.get(u // 63, 0) | (1 << (u % 63))
        return words

    for build in (bitmap_words, _bloom_bits):
        wa, wb = build(a), build(b)
        merged = {
            w: wa.get(w, 0) | wb.get(w, 0) for w in set(wa) | set(wb)
        }
        assert merged == build(a | b)
