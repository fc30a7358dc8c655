"""Property-based tests for the dedup/similarity CANDIDATE GENERATORS
(r10 verdict task 5) — the last custom-operator family without
randomized semantic probing.

The LSH machinery is deterministic given the signatures (salted-md5
minhash, banded md5 digests), so the properties assert EXACT
equivalence against an independent Python model, which is strictly
stronger than the probabilistic "recall above threshold" framing:

- ``lsh_candidate_pairs`` == the band-collision model (a pair is a
  candidate iff the two docs share at least one full band digest) —
  which by construction contains every pair with identical non-empty
  shingle sets (Jaccard = 1);
- ``lsh_star_edges`` == the per-bucket min-star model, and the star's
  connected components equal the all-pairs candidates' components
  (the transitivity claim that lets the O(N·bands) star replace the
  Σ bucket² pair listing for dedup);
- ``jaccard_from_arrays`` == Python set arithmetic on the candidates;
- ``cosine_near_dup_pairs`` is row-identical across all four plan
  shapes (join vs grouped-Arrow kernel × hot-bucket guard on/off) and
  equals a Python float64 model that replays the exact left-fold
  element order and the shared floor(x·10ⁿ+0.5)/10ⁿ rounding.

Each example runs real (tiny) Spark jobs; max_examples stays small.
"""

from __future__ import annotations

import hashlib
import itertools
import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from stacktrend_spark.operators.dedup import (
    jaccard_from_arrays,
    lsh_candidate_pairs,
    lsh_star_edges,
    minhash_signatures_from_arrays,
)
from stacktrend_spark.operators.similarity import cosine_near_dup_pairs

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny token alphabet → real signature collisions and duplicate sets
_token = st.sampled_from(["ab", "cd", "ef", "gh", "ij", "kl"])
_corpus = st.lists(
    st.lists(_token, min_size=0, max_size=5),
    min_size=2,
    max_size=10,
)

NUM_HASHES = 4
BAND_SIZE = 2


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _model_signature(tokens: list[str]) -> list[str] | None:
    """Python replica of minhash_signatures_from_arrays: per salt i,
    min md5 over the shingle array (empty array → NULL signature)."""
    if not tokens:
        return None
    return [min(_md5(f"{i}|{t}") for t in tokens) for i in range(NUM_HASHES)]


def _model_band_keys(sig: list[str] | None) -> list[str] | None:
    if sig is None:
        return None
    n_bands = NUM_HASHES // BAND_SIZE
    return [
        _md5("".join(sig[b * BAND_SIZE : (b + 1) * BAND_SIZE]))
        for b in range(n_bands)
    ]


def _model_buckets(corpus: list[list[str]]) -> dict[tuple[int, str], list[int]]:
    """(band_id, band_key) → sorted member ids; NULL-signature docs
    never join (SQL equality semantics)."""
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, tokens in enumerate(corpus):
        keys = _model_band_keys(_model_signature(tokens))
        if keys is None:
            continue
        for band_id, key in enumerate(keys):
            buckets.setdefault((band_id, key), []).append(doc_id)
    return buckets


def _corpus_df(spark, corpus):
    return spark.createDataFrame(
        [(i, toks, len(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, shingles array<string>, n_shingles long",
    )


def _components(n: int, edges: set[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@_SETTINGS
@given(corpus=_corpus)
def test_lsh_candidate_pairs_equal_band_collision_model(spark, corpus):
    sigs = minhash_signatures_from_arrays(
        _corpus_df(spark, corpus), "doc_id", num_hashes=NUM_HASHES
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", num_hashes=NUM_HASHES, band_size=BAND_SIZE
        ).collect()
    }
    want = set()
    for members in _model_buckets(corpus).values():
        want.update(itertools.combinations(members, 2))
    assert got == want
    # corollary (the recall guarantee the docstring sells): any two
    # docs with identical NON-EMPTY shingle sets are always candidates
    for i, j in itertools.combinations(range(len(corpus)), 2):
        if corpus[i] and set(corpus[i]) == set(corpus[j]):
            assert (i, j) in got


@_SETTINGS
@given(corpus=_corpus)
def test_lsh_star_edges_model_and_component_equivalence(spark, corpus):
    sigs = minhash_signatures_from_arrays(
        _corpus_df(spark, corpus), "doc_id", num_hashes=NUM_HASHES
    )
    star = {
        (r["id_a"], r["id_b"])
        for r in lsh_star_edges(
            sigs, "doc_id", num_hashes=NUM_HASHES, band_size=BAND_SIZE
        ).collect()
    }
    buckets = _model_buckets(corpus)
    want = set()
    for members in buckets.values():
        lo = min(members)
        want.update((lo, m) for m in members if m > lo)
    assert star == want
    # the star is a subset of the all-pairs candidates...
    all_pairs = set()
    for members in buckets.values():
        all_pairs.update(itertools.combinations(members, 2))
    assert star <= all_pairs
    # ...with IDENTICAL connected components (the transitivity claim
    # that makes the O(N·bands) star sufficient for dedup)
    n = len(corpus)
    assert _components(n, star) == _components(n, all_pairs)


@_SETTINGS
@given(corpus=_corpus)
def test_jaccard_from_arrays_matches_set_arithmetic(spark, corpus):
    arr = _corpus_df(spark, corpus)
    sigs = minhash_signatures_from_arrays(arr, "doc_id", num_hashes=NUM_HASHES)
    cands = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    rows = jaccard_from_arrays(arr, "doc_id", cands).collect()
    # NB: array_intersect / the n_shingles column work on the ARRAY
    # form (duplicates collapse in intersect; n_* counts raw length),
    # which is how every registered caller builds its inputs — the
    # shingle arrays there are produced distinct. Mirror exactly:
    for r in rows:
        a, b = corpus[r["id_a"]], corpus[r["id_b"]]
        assert r["n_common"] == len(set(a) & set(b))
        assert r["n_a"] == len(a)
        assert r["n_b"] == len(b)


# --------------------------------------------------------------------------
# cosine_near_dup_pairs: 4 plan shapes, one result
# --------------------------------------------------------------------------

_DIM = 3
_component = st.integers(-4, 4).map(lambda v: v * 0.5)
_vec = st.lists(_component, min_size=_DIM, max_size=_DIM).filter(
    lambda v: any(x != 0.0 for x in v)
)
_vectors = st.lists(_vec, min_size=2, max_size=9)
_threshold = st.sampled_from([-1.0, 0.0, 0.5, 0.9])


def _model_near_dup(rows, threshold):
    """Python float64 replica of the unguarded join path: left-fold
    dot/norm in element order, floor(x·1e6+0.5)/1e6 rounding."""

    def fold_dot(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        return acc

    out = set()
    for (ia, la, va), (ib, lb, vb) in itertools.combinations(rows, 2):
        if la != lb:
            continue
        sim = fold_dot(va, vb) / (
            math.sqrt(fold_dot(va, va)) * math.sqrt(fold_dot(vb, vb))
        )
        sim = math.floor(sim * 1e6 + 0.5) / 1e6
        if sim >= threshold:
            out.add((min(ia, ib), max(ia, ib), sim))
    return out


@_SETTINGS
@given(vectors=_vectors, labels=st.data(), threshold=_threshold)
def test_cosine_near_dup_four_plans_agree(spark, vectors, labels, threshold):
    rows = [
        (
            i,
            labels.draw(st.integers(0, 1), label=f"label{i}"),
            vectors[i],
        )
        for i in range(len(vectors))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    variants = {
        "join": dict(dim=None, max_bucket_rows=None),
        "join+guard": dict(dim=None, max_bucket_rows=2),
        "grouped": dict(dim=_DIM, max_bucket_rows=None),
        "grouped+guard": dict(dim=_DIM, max_bucket_rows=2),
    }
    results = {}
    for name, kw in variants.items():
        got = cosine_near_dup_pairs(
            df,
            threshold,
            id_col="vec_id",
            vec_col="embedding",
            bucket_col="label",
            **kw,
        ).collect()
        results[name] = {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in got}
    want = _model_near_dup(rows, threshold)
    for name, got in results.items():
        assert got == want, f"{name} diverged: {got ^ want}"


# --------------------------------------------------------------------------
# SimHash family: grouped vs narrow vs Python model; hamming pigeonhole
# --------------------------------------------------------------------------

_HIGH = set("89abcdef")
_word = st.sampled_from(["the", "cat", "sat", "on", "mat", "dog"])
_texts = st.lists(
    st.lists(_word, min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=8,
)


def _model_simhash(text: str) -> int:
    """Python replica: ±1 vote per token per bit from the high bit of
    the bit-th md5 hex nibble; bit set iff the vote sum is positive.
    Frequency-weighted (duplicate tokens vote repeatedly), and
    split(text, ' ') keeps empty tokens exactly like Spark's split."""
    tokens = text.lower().split(" ")
    sig = 0
    for b in range(1, 33):
        v = sum(
            1 if _md5(t)[b - 1] in _HIGH else -1 for t in tokens
        )
        if v > 0:
            sig |= 1 << (b - 1)
    return sig


@_SETTINGS
@given(texts=_texts)
def test_simhash_grouped_narrow_python_agree(spark, texts):
    from stacktrend_spark.operators.dedup import simhash, simhash_narrow

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    narrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash_narrow(docs, "doc_id", "text").collect()
    }
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    grouped = {
        r["doc_id"]: r["simhash"] for r in simhash(tokens, "doc_id").collect()
    }
    want = {i: _model_simhash(t) for i, t in enumerate(texts)}
    assert narrow == want
    assert grouped == want


_sig32 = st.integers(0, 2**32 - 1)


@st.composite
def _signature_sets(draw):
    """Random signatures plus planted near-misses: flips of 1-5 bits of
    a base signature land pairs exactly on the d<=3 decision boundary
    (3 in, 4-5 out)."""
    base = draw(st.lists(_sig32, min_size=1, max_size=6))
    planted = []
    for sig in base[:3]:
        n_flips = draw(st.integers(1, 5))
        bits = draw(
            st.lists(st.integers(0, 31), min_size=n_flips, max_size=n_flips,
                     unique=True)
        )
        flipped = sig
        for b in bits:
            flipped ^= 1 << b
        planted.append(flipped)
    return base + planted


@_SETTINGS
@given(sigs=_signature_sets())
def test_hamming_band_candidates_pigeonhole_complete(spark, sigs):
    """The 4x8-bit band search returns EXACTLY the brute-force set of
    pairs within hamming distance 3 — completeness is the pigeonhole
    (d<=3 across 4 disjoint bands forces one exact band match), and
    soundness is the popcount verify."""
    from stacktrend_spark.operators.dedup import hamming_band_candidates

    df = spark.createDataFrame(
        list(enumerate(sigs)), "doc_id long, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_band_candidates(df, "doc_id").collect()
    }
    want = set()
    for (ia, sa), (ib, sb) in itertools.combinations(enumerate(sigs), 2):
        d = bin(sa ^ sb).count("1")
        if d <= 3:
            want.add((ia, ib, d))
    assert got == want


# full 64-bit signatures, sign bit included: values >= 2^63 become
# NEGATIVE Spark longs — the case the r11 div/% band extraction broke
# (arithmetic div rounds toward zero and carries sign, so two sigs at
# hamming 1 across the sign bit matched zero bands)
_sig64u = st.integers(0, 2**64 - 1)


def _to_i64(u: int) -> int:
    return u - 2**64 if u >= 2**63 else u


@st.composite
def _signature_sets_64(draw):
    """Random u64 signatures plus planted 1-5 bit flips; flips of the
    HIGH bits (56-63) cross the sign boundary on purpose."""
    base = draw(st.lists(_sig64u, min_size=1, max_size=5))
    planted = []
    for sig in base[:3]:
        n_flips = draw(st.integers(1, 5))
        bits = draw(
            st.lists(st.integers(0, 63), min_size=n_flips, max_size=n_flips,
                     unique=True)
        )
        flipped = sig
        for b in bits:
            flipped ^= 1 << b
        planted.append(flipped)
    # guaranteed sign-boundary near-miss in every case
    planted.append(base[0] ^ (1 << 63))
    return [_to_i64(u) for u in base + planted]


@_SETTINGS
@given(sigs=_signature_sets_64())
def test_hamming_band_candidates_64bit_negative(spark, sigs):
    """The 4x16-bit band search (the 64-bit scale configuration) is
    EXACTLY brute force for signed 64-bit signatures, sign-bit flips
    included — pins the r11 ADVICE fix (logical shift+mask band
    extraction instead of div/%, which sign-contaminated bands)."""
    from stacktrend_spark.operators.dedup import hamming_band_candidates

    df = spark.createDataFrame(
        list(enumerate(sigs)), "doc_id long, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_band_candidates(df, "doc_id", band_bits=16).collect()
    }
    want = set()
    for (ia, sa), (ib, sb) in itertools.combinations(enumerate(sigs), 2):
        d = bin((sa ^ sb) & (2**64 - 1)).count("1")
        if d <= 3:
            want.add((ia, ib, d))
    assert got == want


def test_hamming_band_negative_regression(spark):
    """The exact ADVICE counterexample: -1 vs 2^63-1 differ only in
    the sign bit (hamming 1) — div/% band extraction returned ZERO
    pairs; shift+mask must return the pair."""
    from stacktrend_spark.operators.dedup import hamming_band_candidates

    df = spark.createDataFrame(
        [(0, -1), (1, 2**63 - 1)], "doc_id long, simhash long"
    )
    got = [
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_band_candidates(df, "doc_id", band_bits=16).collect()
    ]
    assert got == [(0, 1, 1)]


# --------------------------------------------------------------------------
# Arrow cell-assignment kernels (the SemDeDup / IVF engine):
# rank_cells_arrow / with_cell_arrow vs a Python replica of the pinned
# parity contract (left-fold dist², (dist2, cid) tie-break)
# --------------------------------------------------------------------------

_DIMC = 3
_f32c = st.integers(-3, 3).map(lambda v: v * 0.25)
_cvec = st.lists(_f32c, min_size=_DIMC, max_size=_DIMC)
# small alphabet → duplicate centroids happen, exercising the cid
# tie-break; vectors may equal centroids, landing dist2 exactly on 0
_assign_case = st.tuples(
    st.lists(_cvec, min_size=1, max_size=6),  # vectors
    st.lists(_cvec, min_size=1, max_size=5),  # centroids
)


def _fold(u, v):
    acc = 0.0
    for x, y in zip(u, v):
        acc = acc + x * y
    return acc


def _model_ranking(vectors, centroids):
    """(vec_idx -> [cid by (dist2, cid)]) with the exact pinned float64
    arithmetic: dist2 = (<a,a> + <c,c>) - 2<a,c>, every dot a
    sequential left-fold over float32-truncated inputs."""
    import numpy as np

    out = {}
    for i, v in enumerate(vectors):
        v64 = [float(np.float32(x)) for x in v]
        scored = []
        for cid, c in centroids:
            c64 = [float(x) for x in c]
            d2 = (_fold(v64, v64) + _fold(c64, c64)) - 2.0 * _fold(v64, c64)
            scored.append((d2, cid))
        scored.sort()
        out[i] = [cid for _, cid in scored]
    return out


@_SETTINGS
@given(case=_assign_case)
def test_rank_cells_and_with_cell_match_python_model(spark, case):
    from stacktrend_spark.operators.similarity import (
        rank_cells_arrow,
        with_cell_arrow,
    )

    vectors, cent_vecs = case
    # centroids keep float64 components (collected lists in production
    # come from float32 embeddings, but the operator contract accepts
    # any floats); vectors go through the array<float> column type
    centroids = [(cid, list(map(float, c))) for cid, c in enumerate(cent_vecs)]
    df = spark.createDataFrame(
        list(enumerate(vectors)), "vec_id long, embedding array<float>"
    )
    want = _model_ranking(vectors, centroids)

    ranked = rank_cells_arrow(df, centroids, _DIMC).collect()
    got: dict[int, list[int]] = {}
    for r in sorted(ranked, key=lambda r: (r["vec_id"], r["rn"])):
        got.setdefault(r["vec_id"], []).append(r["cid"])
    assert got == want

    assigned = with_cell_arrow(df, centroids, _DIMC).collect()
    # fused form: rank-1 agreement, all rows and columns preserved
    assert len(assigned) == len(vectors)
    for r in assigned:
        assert r["cell"] == want[r["vec_id"]][0]
        assert [float(x) for x in r["embedding"]] == [
            float(__import__("numpy").float32(x)) for x in vectors[r["vec_id"]]
        ]
