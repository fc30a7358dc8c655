"""Keyed upsert (MERGE) operators — the reference's four merge policies
re-expressed as pure DataFrame transforms.

Reference semantics reproduced (SURVEY §2.1 S11/S12/S14):

- plain upsert          — update matched, insert new
  (github_data_ingestion.py:355-383, MERGE ON repository_id)
- insert-only merge     — dedup-on-write for immutable event rows
  (personal_repos_ingestion.py:424-431, "activities are immutable")
- update-all merge      — refresh every column for matched keys
  (personal_repos_bronze_to_silver.py:811-823)
- conditional-preserve  — keep the target's "good" columns when a
  predicate holds, always refresh the rest (the smart-classification
  CASE merge, bronze_to_silver_transformation.py:899-914)

Delta Lake isn't available in this environment, so these are
implemented engine-side: one left join resolves matched rows, one
left-anti keeps untouched target rows, and a unionByName stitches the
result — 2 shuffles on the merge keys, no driver round-trip.

Scale note (100 TB): on a real cluster this module would delegate to
Delta ``MERGE INTO`` (file-skipping + deletion vectors); the emulation
is partition-friendly — both join and anti-join shuffle on the same
keys, so AQE plans one exchange per side, and writing the result with
dynamic partition overwrite rewrites only affected partitions. Keep
merge keys high-cardinality (they are: repository_id / event identity)
so the shuffle has no skew.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_cond(keys: list[str]) -> Column:
    """NULL-SAFE key equality (t.k <=> s.k) between frames aliased
    ``t`` and ``s`` — the same ON condition the Delta backend builds
    (operators/delta_backend.py), so a NULL merge key matches its own
    row on BOTH backends instead of silently falling through to INSERT
    on the emulation only (r8 review)."""
    return reduce(
        Column.__and__,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )


def _validate(target: DataFrame, source: DataFrame, keys: list[str]) -> None:
    for k in keys:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"merge key {k!r} missing from target or source")
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target-only {set(target.columns) - set(source.columns)}, "
            f"source-only {set(source.columns) - set(target.columns)}"
        )


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Plain upsert: matched target rows are replaced by source rows,
    unmatched source rows are inserted, untouched target rows kept.
    Mirrors MERGE … WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED
    THEN INSERT * (github_data_ingestion.py:355-383). NULL merge keys
    match null-safely, exactly like the Delta backend's <=> ON cond."""
    _validate(target, source, keys)
    untouched = target.alias("t").join(
        source.select(*keys).alias("s"), _key_cond(keys), "left_anti"
    )
    return untouched.unionByName(source)


# update-all merge (prb2s:811-823) has identical semantics to the plain
# upsert once expressed relationally: every matched column refreshed.
merge_update_all = merge_upsert


def merge_insert_only(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """Insert-only merge: source rows whose key already exists in the
    target are dropped; new keys are deduplicated and appended. The
    event-table dedup-on-write policy (personal_repos_ingestion.py:
    424-431 — "activities are immutable"). NULL merge keys match
    null-safely (Delta <=> parity); dropDuplicates already groups
    NULLs together."""
    _validate(target, source, keys)
    new_rows = (
        source.alias("s")
        .join(
            target.select(*keys).alias("t"),
            _key_cond(keys),
            "left_anti",
        )
        .dropDuplicates(keys)
    )
    return target.unionByName(new_rows)


def merge_preserve(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    preserve_cols: list[str],
    preserve_when: Column,
) -> DataFrame:
    """Conditional-preserve merge (the reference's core "smart merge",
    bronze_to_silver_transformation.py:899-914): for matched keys,
    keep the TARGET's ``preserve_cols`` when ``preserve_when`` (a
    predicate over ``t.<col>`` target columns) holds, otherwise take
    the source's; every other column always refreshes from the source.
    Unmatched source rows insert; untouched target rows persist.

    ``preserve_when`` must reference target columns via the ``t``
    alias, e.g. ``(F.col("t.confidence") >= 0.8) &
    (F.col("t.category") != "Other")``.
    """
    _validate(target, source, keys)
    s = source.alias("s")
    t = target.alias("t")
    resolved_cols = []
    for c in source.columns:
        if c in keys:
            resolved_cols.append(F.col(f"s.{c}").alias(c))
        elif c in preserve_cols:
            # no match → t.* is null → preserve_when is null → falls to source
            resolved_cols.append(
                F.when(preserve_when, F.col(f"t.{c}"))
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
            )
        else:
            resolved_cols.append(F.col(f"s.{c}").alias(c))
    resolved = s.join(t, _key_cond(keys), "left").select(*resolved_cols)
    untouched = target.alias("t").join(
        source.select(*keys).alias("s"), _key_cond(keys), "left_anti"
    )
    return untouched.unionByName(resolved)


def merge_full_sync(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    scope: Column,
) -> DataFrame:
    """Partition-scoped full synchronization — the fourth MERGE clause
    family (WHEN NOT MATCHED BY SOURCE THEN DELETE, Delta/SQL:2003
    F314): within ``scope`` (a predicate over target columns), matched
    rows update from the source, new source rows insert, and target
    rows ABSENT from the source are DELETED; rows outside the scope
    are untouched. This is how a daily re-sync repairs one partition
    without rewriting the table — an unscoped not-matched-by-source
    delete would degenerate to "result = source".

    NULL handling matches Delta/SQL MERGE: a WHEN NOT MATCHED BY
    SOURCE clause whose condition evaluates to NULL does NOT fire, so
    a target row where ``scope`` is NULL is PRESERVED (treated as
    out-of-scope), not deleted. Source rows where ``scope`` evaluates
    to NULL or FALSE are ignored — only in-scope source rows
    participate in the sync, keeping the "rows outside the scope are
    untouched" contract even when the caller hands a wider feed.

    Precondition: in-scope source rows must be key-unique. Duplicate
    keys are collapsed by ``dropDuplicates`` with an engine-chosen
    survivor (Delta MERGE would instead error on multi-match); callers
    that need the strict behavior should dedupe-or-assert upstream.

    Scale: the scoped slice is a pure filter (no shuffle); the source
    dedupe shuffles once on the merge keys; the out-of-scope remainder
    never shuffles.
    """
    _validate(target, source, keys)
    scope_true = F.coalesce(scope, F.lit(False))
    outside = target.filter(~scope_true)
    # inside the scope the in-scope source IS the truth: updates,
    # inserts and deletes all collapse to "take the source rows"
    return outside.unionByName(source.filter(scope_true).dropDuplicates(keys))
