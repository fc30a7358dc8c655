"""Bounded-output MinHash dedup (r6): the star candidate generator's
output contract, its agreement with the all-pairs form, and the
kcore checkpoint knob's result-invariance (complement to the
oracle-parity gate — these pin OPERATOR semantics)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from stacktrend_spark.operators.dedup import (
    lsh_star_edges,
    minhash_signatures_from_arrays,
    shingle_arrays,
)
from stacktrend_spark.plans.northstar import (
    _BAND_SIZE,
    _MINHASH_K,
    _corpus_near,
    dedup_minhash_lsh,
    dedup_minhash_star,
    dedup_star_clusters,
)

N_BANDS = _MINHASH_K // _BAND_SIZE


def test_star_edges_bounded_per_member(spark, sf_dir):
    arrs = shingle_arrays(_corpus_near(spark, sf_dir), "doc_id", "text", n=3)
    sigs = minhash_signatures_from_arrays(arrs, "doc_id", num_hashes=_MINHASH_K)
    edges = lsh_star_edges(
        sigs, "doc_id", num_hashes=_MINHASH_K, band_size=_BAND_SIZE
    ).collect()
    per_member = defaultdict(int)
    for r in edges:
        assert r.id_a < r.id_b
        per_member[r.id_b] += 1
    # the output contract: ≤ one candidate edge per (member, band) —
    # this is what makes pair volume corpus-linear on mirror corpora
    assert per_member, "corpus should produce at least one candidate"
    assert max(per_member.values()) <= N_BANDS


def test_star_verified_is_subset_of_allpairs(spark, sf_dir):
    star = {
        (r.id_a, r.id_b, r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in dedup_minhash_star(spark, sf_dir).collect()
    }
    allpairs = {
        (r.id_a, r.id_b, r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    # star candidates are a subset of bucket all-pairs, and the
    # verification math is byte-identical — so the scored rows nest
    assert star <= allpairs


def test_star_clusters_are_consistent_labelings(spark, sf_dir):
    labels = {
        r.doc_id: r.cluster_id for r in dedup_star_clusters(spark, sf_dir).collect()
    }
    edges = dedup_minhash_star(spark, sf_dir).select("id_a", "id_b").collect()
    assert labels
    for doc, lbl in labels.items():
        assert lbl <= doc  # min-reachable labeling
        assert lbl in labels  # label is itself a known node
    for e in edges:
        # both endpoints of every verified edge share a component
        assert labels[e.id_a] == labels[e.id_b]


def test_star_clusters_recover_allpairs_cocluster_recall(spark, sf_dir):
    """Quantifies the bucket-representative trade: docs the ALL-PAIRS
    contract proves equivalent should land in one star cluster too.
    The star can only miss a pair (a,b) when their shared bucket's min
    doc m is dissimilar to one of them (m-a or m-b fails verification
    while a-b would pass) — on dup-family corpora (planted copies
    here, mirrors at 100 TB) families are homogeneous, so recall
    should be total. Assert 100% on this corpus and surface the
    number if the synthesizer ever changes shape."""
    star_labels = {
        r.doc_id: r.cluster_id for r in dedup_star_clusters(spark, sf_dir).collect()
    }
    allpair_edges = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b").collect()
    missed = [
        (e.id_a, e.id_b)
        for e in allpair_edges
        if star_labels[e.id_a] != star_labels[e.id_b]
    ]
    recall = 1 - len(missed) / max(len(allpair_edges), 1)
    assert recall == 1.0, f"star recall {recall:.3f}; first misses: {missed[:5]}"


def test_kcore_checkpoint_every_preserves_result(spark, sf_dir):
    from stacktrend_spark.plans.graphrank import kcore_peel
    from stacktrend_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    def run(ck):
        out = kcore_peel(edges, k=2, rounds=4, checkpoint_every=ck)
        return sorted(
            (r.src, r.cnt)
            for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("cnt")).collect()
        )

    assert run(0) == run(2)  # lineage and truncated plans agree exactly


def test_semdedup_pairs_subset_of_exhaustive(spark, sf_dir):
    """Cell scoping only RESTRICTS candidates: every cell-scoped pair
    must appear in the exhaustive same-label set, with the identical
    rounded cosine."""
    from stacktrend_spark.plans.northstar import (
        dedup_embedding_cosine,
        dedup_semdedup_pairs,
    )

    true_pairs = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    found = dedup_semdedup_pairs(spark, sf_dir).collect()
    assert found, "cell scoping must not empty the planted near-dups"
    for r in found:
        assert (r["id_a"], r["id_b"]) in true_pairs
        assert r["cosine_sim"] == true_pairs[(r["id_a"], r["id_b"])]


def test_semdedup_recall_eval_consistency(spark, sf_dir):
    """recall_bp is the exact integer bp of n_found/n_true per band,
    n_found <= n_true, and the banded totals reconcile with the two
    pair sets."""
    from stacktrend_spark.plans.northstar import (
        dedup_embedding_cosine,
        dedup_semdedup_pairs,
        semdedup_recall_eval,
    )

    rows = semdedup_recall_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_found"] <= r["n_true"]
        assert r["recall_bp"] == r["n_found"] * 10000 // r["n_true"]
    assert sum(r["n_true"] for r in rows) == dedup_embedding_cosine(
        spark, sf_dir
    ).count()
    assert sum(r["n_found"] for r in rows) == dedup_semdedup_pairs(
        spark, sf_dir
    ).count()
