"""Invariant tests for the corpus-selection and dedup-audit layers
(plans/selection.py, plans/dedup_audit.py).

Value-exactness against DuckDB is covered by the oracle-parity sweep;
these pin the STRUCTURAL guarantees each operator advertises — budget
never exceeded, quantile stages balanced, shares bounded, histogram
mass conservation — which a value-identical-but-wrong oracle pair
could not catch (both sides would drift together).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stacktrend_spark.plans.dedup_audit import (
    dedup_cluster_stats,
    dedup_containment_star,
    max_word_run_lengths,
)
from stacktrend_spark.plans.selection import (
    _BUDGET_DIV,
    _STAGES,
    c4_boilerplate_ngrams,
    curriculum_stage_assign,
    ngram_novelty_decay,
    quality_budget_cut,
)
from stacktrend_spark.sources.tables import load_table

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_budget_cut_never_exceeds_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).cast("long")
    ).collect()[0][0]
    out = quality_budget_cut(spark, sf_dir)
    kept = out.agg(F.sum("tokens_kept").cast("long")).collect()[0][0]
    assert 0 < kept <= total // _BUDGET_DIV


def test_curriculum_stages_partition_and_balance(spark, sf_dir):
    out = curriculum_stage_assign(spark, sf_dir).collect()
    n_docs_total = sum(r["n_docs"] for r in out)
    n_corpus = load_table(spark, sf_dir, "documents").count()
    assert n_docs_total == n_corpus  # every doc staged exactly once
    stages = {}
    for r in out:
        stages[r["stage"]] = stages.get(r["stage"], 0) + r["n_docs"]
    assert set(stages) == set(range(_STAGES))
    # floor bucketing (rnk-1)*K DIV n: stage sizes differ by at most 1
    assert max(stages.values()) - min(stages.values()) <= 1


def test_boilerplate_share_bounded(spark, sf_dir):
    out = c4_boilerplate_ngrams(spark, sf_dir)
    bad = out.filter(
        (F.col("boiler_bp") < 0)
        | (F.col("boiler_bp") > 10000)
        | (F.col("n_boiler") > F.col("n_trigrams"))
    ).count()
    assert bad == 0
    # every doc with >= 3 words appears exactly once
    n_eligible = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) >= 3)
        .count()
    )
    assert out.count() == n_eligible


def test_novelty_mass_conservation(spark, sf_dir):
    out = ngram_novelty_decay(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.split("text", " ")
    )
    vocab = (
        docs.select(
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(w) - 3), "
                    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))"
                )
            ).alias("g")
        )
        .distinct()
        .count()
    )
    # each distinct trigram is novel in exactly one document
    assert sum(r["n_novel"] for r in out) == vocab
    assert all(0 <= r["novelty_bp"] <= 10000 for r in out)


def test_cluster_stats_mass_conservation(spark, sf_dir):
    out = dedup_cluster_stats(spark, sf_dir).collect()
    for r in out:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]
    # histogram mass = every shingled corpus node exactly once
    from stacktrend_spark.plans.northstar import _corpus_near

    n_nodes = (
        _corpus_near(spark, sf_dir)
        .filter(F.size(F.split(F.lower("text"), " ")) >= 3)
        .count()
    )
    assert sum(r["n_docs"] for r in out) == n_nodes


def test_containment_thresholds(spark, sf_dir):
    rows = dedup_containment_star(spark, sf_dir).collect()
    assert rows, "planted truncated copies must surface containment pairs"
    for r in rows:
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 10 * r["n_common"] >= 8 * min(r["n_a"], r["n_b"])
        assert 0.0 < r["containment"] <= 1.0


def test_word_runs_bounds(spark, sf_dir):
    out = max_word_run_lengths(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    bad = out.filter(
        (F.col("max_run") < 1)
        | (F.col("max_run") > F.col("n_words"))
        | (F.col("n_runs_ge3") < 0)
    ).count()
    assert bad == 0


def test_band_tuning_monotone_tradeoff(spark, sf_dir):
    """Band refinement guarantees BOTH monotonicities structurally:
    a 2x4 band match implies the two 4x2 matches it contains, which
    imply the four 8x1 matches — so recall can only fall as bands
    widen; and every wider-band bucket is a refinement of a
    narrower-band bucket, so Sigma C(n,2) candidate work can only
    fall too. A violation means the band digests are miswired."""
    from stacktrend_spark.plans.dedup_audit import minhash_band_tuning

    rows = {r["band_size"]: r for r in minhash_band_tuning(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_caught"] >= rows[2]["n_caught"] >= rows[4]["n_caught"]
    assert (
        rows[1]["n_candidate_pairs"]
        >= rows[2]["n_candidate_pairs"]
        >= rows[4]["n_candidate_pairs"]
    )
    # planted truncated copies are genuinely near-dup: 8 single-hash
    # bands must catch essentially all of them
    assert rows[1]["recall_bp"] >= 9000


def test_corrupt_routing_partitions_feed(spark, sf_dir):
    from stacktrend_spark.plans.formats import source_corrupt_record_routing

    r = source_corrupt_record_routing(spark, sf_dir).collect()[0]
    assert r["n_total"] == r["n_valid"] + r["n_quarantined"]
    assert r["n_quarantined"] > 0 and r["n_valid"] > 0
