"""Property tests for the merge operators (SURVEY §5: merge idempotency
and preservation semantics — the reference ships these as MERGE
guarantees; we assert them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stacktrend_spark.operators.merge import (
    merge_insert_only,
    merge_preserve,
    merge_upsert,
)


def _df(spark, rows, schema="k long, category string, confidence double, metric double"):
    return spark.createDataFrame(rows, schema)


def test_upsert_updates_and_inserts(spark):
    target = _df(spark, [(1, "a", 0.9, 10.0), (2, "b", 0.5, 20.0)])
    source = _df(spark, [(2, "b2", 0.7, 21.0), (3, "c", 0.6, 30.0)])
    out = {r["k"]: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert out[1]["category"] == "a"  # untouched
    assert out[2]["category"] == "b2"  # updated
    assert out[3]["category"] == "c"  # inserted


def test_upsert_idempotent(spark):
    target = _df(spark, [(1, "a", 0.9, 10.0), (2, "b", 0.5, 20.0)])
    source = _df(spark, [(2, "b2", 0.7, 21.0), (3, "c", 0.6, 30.0)])
    once = merge_upsert(target, source, ["k"])
    twice = merge_upsert(once, source, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_insert_only_never_mutates(spark):
    target = _df(spark, [(1, "a", 0.9, 10.0)])
    source = _df(spark, [(1, "CHANGED", 0.1, 99.0), (2, "b", 0.5, 20.0)])
    out = {r["k"]: r for r in merge_insert_only(target, source, ["k"]).collect()}
    assert out[1]["category"] == "a"  # immutable: existing row untouched
    assert out[2]["category"] == "b"


def test_insert_only_dedups_batch(spark):
    target = _df(spark, [])
    source = _df(spark, [(1, "a", 0.9, 10.0), (1, "a", 0.9, 10.0)])
    assert merge_insert_only(target, source, ["k"]).count() == 1


def test_preserve_keeps_good_classification_refreshes_metrics(spark):
    # row 1: well-classified (conf .9) → category/confidence preserved,
    # metric refreshed; row 2: weak (conf .3) → everything refreshed.
    target = _df(spark, [(1, "Web", 0.9, 10.0), (2, "Other", 0.3, 20.0)])
    source = _df(spark, [(1, "LLMNew", 0.5, 11.0), (2, "AI", 0.95, 21.0), (3, "Data", 0.8, 30.0)])
    preserve_when = (F.col("t.confidence") >= 0.8) & (F.col("t.category") != "Other")
    out = {
        r["k"]: r
        for r in merge_preserve(
            target, source, ["k"], ["category", "confidence"], preserve_when
        ).collect()
    }
    assert out[1]["category"] == "Web" and out[1]["confidence"] == 0.9
    assert out[1]["metric"] == 11.0  # metrics always refresh
    assert out[2]["category"] == "AI"  # weak classification replaced
    assert out[3]["category"] == "Data"  # insert path


def test_schema_mismatch_rejected(spark):
    target = _df(spark, [(1, "a", 0.9, 10.0)])
    bad = target.drop("metric")
    try:
        merge_upsert(target, bad, ["k"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_full_sync_deletes_updates_and_preserves(spark, sf_dir):
    """The three clause effects of the scoped full sync: in-scope rows
    absent from the source are GONE, in-scope survivors carry source
    values, out-of-scope rows are byte-identical to the target."""
    from pyspark.sql import functions as F

    from stacktrend_spark.operators.merge import merge_full_sync
    from stacktrend_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    scope = F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    source = orders.filter(scope).filter(F.col("o_orderkey") % 7 != 0)
    synced = merge_full_sync(orders, source, ["o_orderkey"], scope)
    # deletions: no in-scope row with orderkey % 7 == 0 survives
    assert synced.filter(scope & (F.col("o_orderkey") % 7 == 0)).count() == 0
    # preservation: out-of-scope row count unchanged
    assert synced.filter(~scope).count() == orders.filter(~scope).count()
    # conservation: result = out-of-scope + source
    assert synced.count() == orders.filter(~scope).count() + source.count()


def test_full_sync_null_scope_preserves_and_scopes_source(spark):
    """r8 (ADVICE): NULL scope rows are PRESERVED (Delta's
    not-matched-by-source clause does not fire on NULL), and source
    rows outside the scope are ignored — the out-of-scope slice stays
    byte-identical even when the feed is wider than the scope."""
    from stacktrend_spark.operators.merge import merge_full_sync

    target = _df(
        spark,
        [(1, "in", 0.9, 10.0), (2, "out", 0.5, 20.0), (3, None, 0.5, 30.0)],
    )
    # scope over the category column: 'in' → true, 'out' → false,
    # NULL → NULL (three-valued logic)
    scope = F.when(F.col("category") == "in", F.lit(True)).when(
        F.col("category") == "out", F.lit(False)
    )
    # feed carries an in-scope update for k=1 AND an out-of-scope row
    # for k=2 (must be ignored) and a NULL-scope row k=4 (ignored too)
    source = _df(
        spark,
        [(1, "in", 0.95, 11.0), (2, "out", 0.99, 99.0), (4, None, 0.1, 40.0)],
    )
    out = {r["k"]: r for r in merge_full_sync(target, source, ["k"], scope).collect()}
    assert out[1]["metric"] == 11.0  # in-scope update applied
    assert out[2]["metric"] == 20.0  # out-of-scope target untouched
    assert out[3]["metric"] == 30.0  # NULL scope → preserved, not deleted
    assert 4 not in out  # out-of-scope source row never inserted
    assert len(out) == 3
