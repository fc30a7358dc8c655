"""Property-based tests for the MERGE operator family (r12, extending
the r10-r12 property campaign to the reference-parity core).

operators/merge.py re-expresses the reference's four merge policies
(SURVEY §2.1 S11/S12/S14) as join+union transforms; they are
driver-proven on the fixed tables and unit-tested on fixtures. This
suite adds randomized semantic probing against an independent Python
model of SQL MERGE semantics, with the adversarial cases the fixtures
avoid:

- NULL merge keys (the operators promise Delta <=> null-safe
  matching: a NULL key UPDATES its NULL-key target row, it does not
  duplicate it);
- duplicate keys in the SOURCE (upsert keeps them verbatim —
  MERGE-multi-match territory; insert-only/full-sync collapse them
  with an engine-chosen survivor, so the model checks the
  deterministic part exactly and survivor membership otherwise);
- a full-sync scope predicate that evaluates NULL on some rows (the
  SQL contract: NULL scope = out of scope, row preserved on the
  target side, ignored on the source side);
- composite keys.

Results compare as MULTISETS (row order is not part of the contract).
"""

from __future__ import annotations

import pytest
from collections import Counter
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from stacktrend_spark.operators.merge import (
    merge_full_sync,
    merge_insert_only,
    merge_preserve,
    merge_upsert,
)

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SCHEMA = "k long, grp string, v1 double, flag long"
_key = st.one_of(st.none(), st.integers(0, 6))
_grp = st.sampled_from(["a", "b"])
_v1 = st.one_of(st.none(), st.integers(-3, 3).map(float))
_flag = st.integers(0, 1)
_row = st.tuples(_key, _grp, _v1, _flag)

#: target tables are KEY-UNIQUE on k (the keyed-table contract the
#: operators document); None is a key value and appears at most once
_target = st.lists(_row, max_size=8).map(
    lambda rows: list({r[0]: r for r in rows}.values())
)
#: sources may repeat keys freely
_source = st.lists(_row, max_size=8)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _collect(df) -> Counter:
    return Counter(tuple(r) for r in df.collect())


@_SETTINGS
@given(target=_target, source=_source)
def test_merge_upsert_model(spark, target, source):
    """Matched target rows replaced, unmatched kept, ALL source rows
    present verbatim; NULL keys match null-safely."""
    got = _collect(merge_upsert(_df(spark, target), _df(spark, source), ["k"]))
    src_keys = {r[0] for r in source}
    want = Counter(
        map(tuple, [t for t in target if t[0] not in src_keys] + source)
    )
    assert got == want


@_SETTINGS
@given(target=_target, source=_source)
def test_merge_upsert_composite_key_model(spark, target, source):
    """Composite (k, grp) keys, null-safe on each component."""
    # composite-unique target
    target = list({(t[0], t[1]): t for t in target}.values())
    got = _collect(
        merge_upsert(_df(spark, target), _df(spark, source), ["k", "grp"])
    )
    src_keys = {(r[0], r[1]) for r in source}
    want = Counter(
        map(tuple, [t for t in target if (t[0], t[1]) not in src_keys] + source)
    )
    assert got == want


@_SETTINGS
@given(target=_target, source=_source)
def test_merge_insert_only_model(spark, target, source):
    """Existing keys never change; each genuinely-new key inserts
    EXACTLY ONE row, and the survivor is one of that key's source
    rows."""
    got = _collect(
        merge_insert_only(_df(spark, target), _df(spark, source), ["k"])
    )
    tgt_keys = {t[0] for t in target}
    new_keys = {r[0] for r in source} - tgt_keys
    # deterministic part: every target row unchanged
    for t in target:
        assert got[tuple(t)] >= 1
    # one row per new key, zero rows for already-present keys
    inserted = Counter()
    for row, n in got.items():
        base = Counter(map(tuple, target))
        extra = n - base[row]
        if extra:
            inserted[row] += extra
    assert sum(inserted.values()) == len(new_keys)
    by_key = {}
    for row, n in inserted.items():
        assert n == 1
        assert row[0] in new_keys
        assert row in {tuple(r) for r in source}
        assert row[0] not in by_key, "two inserts for one key"
        by_key[row[0]] = row


@_SETTINGS
@given(target=_target, source=_source, thresh=st.integers(0, 1))
def test_merge_preserve_model(spark, target, source, thresh):
    """Matched rows refresh from source except preserve_cols, which
    keep the target value when the target-side predicate holds; an
    unmatched source row's NULL predicate falls through to source."""
    pred = F.col("t.flag") >= thresh
    got = _collect(
        merge_preserve(
            _df(spark, target),
            _df(spark, source),
            ["k"],
            preserve_cols=["grp", "v1"],
            preserve_when=pred,
        )
    )
    tgt_by_key = {t[0]: t for t in target}
    src_keys = {r[0] for r in source}
    resolved = []
    for s in source:
        t = tgt_by_key.get(s[0])
        if t is not None and t[3] >= thresh:  # predicate on target row
            resolved.append((s[0], t[1], t[2], s[3]))
        else:  # no match (NULL predicate) or predicate false → source
            resolved.append(tuple(s))
    untouched = [tuple(t) for t in target if t[0] not in src_keys]
    assert got == Counter(untouched + resolved)


@_SETTINGS
@given(target=_target, source=_source)
def test_merge_full_sync_model(spark, target, source):
    """Within scope (v1 > 0; NULL v1 = out of scope): result is
    exactly the deduped in-scope source. Outside (including NULL
    scope): target rows preserved byte-for-byte, source ignored."""
    scope = F.col("v1") > 0
    got = _collect(
        merge_full_sync(_df(spark, target), _df(spark, source), ["k"], scope)
    )
    outside = [tuple(t) for t in target if not (t[2] is not None and t[2] > 0)]
    in_src = [tuple(s) for s in source if s[2] is not None and s[2] > 0]
    in_keys = {s[0] for s in in_src}
    # deterministic part
    for row in outside:
        assert got[row] >= 1
    det = Counter(outside)
    extra = got - det
    # survivors: one row per in-scope source key, each a real source row
    assert sum(extra.values()) == len(in_keys)
    seen_keys = set()
    for row, n in extra.items():
        assert n == 1 and row in set(in_src)
        assert row[0] not in seen_keys
        seen_keys.add(row[0])
    assert seen_keys == in_keys
