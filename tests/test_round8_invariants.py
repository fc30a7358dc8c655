"""Structural invariants for the round-8 additions — properties the
value oracle can't state (cross-row identities, monotonicity, bounds),
at sf0.001."""

from __future__ import annotations

from stacktrend_spark.plans.registry import all_queries


def _rows(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir).collect()


def test_gopher_keep_bounded_by_each_rule(spark, sf_dir):
    for r in _rows(spark, sf_dir, "gopher_quality_rules"):
        for rule in (
            "pass_wordcount",
            "pass_meanwordlen",
            "pass_stopwords",
            "pass_repetition",
        ):
            assert r["n_keep"] <= r[rule] <= r["n_docs"]
        assert 0 <= r["keep_bp"] <= 10000


def test_mixture_temperature_flattens(spark, sf_dir):
    rows = _rows(spark, sf_dir, "mixture_temperature_weights")
    m = len(rows)
    # integer-DIV weights each round down: sums land in (1e6 - m, 1e6]
    assert 1_000_000 - m < sum(r["w_tau1_ppm"] for r in rows) <= 1_000_000
    assert 1_000_000 - m < sum(r["w_tau05_ppm"] for r in rows) <= 1_000_000
    # temperature 0.5 FLATTENS the mix: the largest source loses
    # weight, the smallest gains (up to integer-DIV slack of 1)
    hi = max(rows, key=lambda r: r["n_tokens"])
    lo = min(rows, key=lambda r: r["n_tokens"])
    assert hi["w_tau05_ppm"] <= hi["w_tau1_ppm"] + 1
    assert lo["w_tau05_ppm"] + 1 >= lo["w_tau1_ppm"]


def test_entropy_bounded_by_log_distinct(spark, sf_dir):
    for r in _rows(spark, sf_dir, "ngram_entropy_profile"):
        assert r["entropy_micro_log10"] >= 0
        # H <= log10(n_distinct); xlog10 interpolation error < 0.04
        import math

        assert r["entropy_micro_log10"] <= (
            math.log10(r["n_distinct"]) + 0.05
        ) * 1_000_000


def test_brier_identity_holds(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "brier_score_decomposition")
    assert (
        r["brier_ppm2"]
        == r["uncertainty_ppm2"] + r["reliability_ppm2"] - r["resolution_ppm2"]
    )
    assert 0 <= r["uncertainty_ppm2"] <= 250_000_000_000  # p(1-p) <= 1/4


def test_bh_stepup_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "bh_fdr_segment_tests")
    kstar = max((r["rnk"] for r in rows if r["p_ppm"] <= r["thr_ppm"]), default=0)
    for r in rows:
        assert r["rejected"] == (1 if r["rnk"] <= kstar else 0)


def test_sprt_decision_matches_boundary(spark, sf_dir):
    from stacktrend_spark.plans.statistics import _SPRT_BOUND

    for r in _rows(spark, sf_dir, "sprt_sequential_monitor"):
        if r["llr_micro"] >= _SPRT_BOUND:
            assert r["decision"] == "accept_h1"
        elif r["llr_micro"] <= -_SPRT_BOUND:
            assert r["decision"] == "accept_h0"
        else:
            assert r["decision"] == "continue"


def test_nprobe_recall_monotone(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "ann_nprobe_recall_sweep"), key=lambda r: r["nprobe"]
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert a["n_hits"] <= b["n_hits"]  # more probes never lose hits
    for r in rows:
        assert 0 <= r["n_hits"] <= 3 * r["n_queries"]


def test_norm_outliers_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "embedding_norm_outliers"):
        assert r["min_norm2"] <= r["mean_norm2"] <= r["max_norm2"]
        assert 0 <= r["n_outliers"] <= r["n_vecs"]


def test_not_in_null_trap(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "anti_join_null_semantics")
    assert r["n_not_in"] == 0  # the trap: NULL in the list kills NOT IN
    assert 0 <= r["n_not_exists"] <= r["n_customers"]


def test_retention_expirable_iff_below_horizon(spark, sf_dir):
    rows = _rows(spark, sf_dir, "snapshot_retention_expiry")
    vmax = max(r["latest_ref_version"] for r in rows)
    for r in rows:
        assert r["is_expirable"] == (
            1 if r["latest_ref_version"] < vmax - 1 else 0
        )


def test_rfm_matrix_partitions_customers(spark, sf_dir):
    rows = _rows(spark, sf_dir, "rfm_migration_matrix")
    assert sum(r["share_bp"] for r in rows) <= 10_000
    assert all(r["n_customers"] > 0 for r in rows)
    # 'none'->'none' is impossible: a customer absent from both halves
    # has no orders at all and never enters the matrix
    assert not any(
        r["tier_before"] == "none" and r["tier_after"] == "none" for r in rows
    )


def test_mode_imputation_fills_all_nulls(spark, sf_dir):
    rows = _rows(spark, sf_dir, "mode_imputation_nulls")
    assert all(r["segment"] is not None for r in rows)
    assert all(0 <= r["n_imputed"] <= r["n_customers"] for r in rows)


def test_vad_segments_are_islands(spark, sf_dir):
    rows = _rows(spark, sf_dir, "multimodal_vad_segments")
    assert rows, "threshold must leave active windows at sf0.001"
    for r in rows:
        assert r["seg_start"] <= r["seg_end"]
        assert r["n_windows"] == r["seg_end"] - r["seg_start"] + 1
    # islands are maximal: no two segments of one doc touch
    bydoc: dict[int, list] = {}
    for r in rows:
        bydoc.setdefault(r["doc_id"], []).append(r)
    for segs in bydoc.values():
        segs.sort(key=lambda r: r["seg_start"])
        for a, b in zip(segs, segs[1:]):
            assert b["seg_start"] > a["seg_end"] + 1


def test_bpe_merges_compress_monotonically(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "bpe_merge_unrolled"), key=lambda r: r["merge_step"]
    )
    assert [r["merge_step"] for r in rows] == [1, 2, 3]
    # each merge strictly shrinks the corpus character mass, by exactly
    # the number of replaced occurrences (2 chars -> 1 symbol)
    for a, b in zip(rows, rows[1:]):
        assert b["corpus_chars_after"] < a["corpus_chars_after"]
    # counts are non-increasing across rounds (argmax over a shrinking
    # pair table can't grow)
    for a, b in zip(rows, rows[1:]):
        assert b["n_occurrences"] <= a["n_occurrences"]


def test_pq_codebook_partitions_each_subspace(spark, sf_dir):
    rows = _rows(spark, sf_dir, "pq_codebook_train_iter")
    assert len(rows) == 4 * 16 * 16
    # within a subspace every codeword's member count is dim-invariant,
    # and the counts sum to the corpus size per (subspace, dim)
    n_vecs = {}
    for r in rows:
        key = (r["subspace"], r["dim"])
        n_vecs[key] = n_vecs.get(key, 0) + r["n_members"]
    assert len(set(n_vecs.values())) == 1  # same corpus in every cell


def test_cluster_split_eliminates_leakage(spark, sf_dir):
    rows = {r["method"]: r for r in _rows(spark, sf_dir, "cluster_aware_split")}
    assert rows["cluster_rep_mod"]["n_clusters_spanning"] == 0
    assert rows["naive_id_mod"]["n_clusters_spanning"] > 0
    # both policies split the same corpus
    assert (
        rows["naive_id_mod"]["n_train"] + rows["naive_id_mod"]["n_test"]
        == rows["cluster_rep_mod"]["n_train"] + rows["cluster_rep_mod"]["n_test"]
    )


def test_word_ngrams_empty_on_short_docs(spark):
    """r8 parity sweep: Spark's sequence(a, b) with b < a is DESCENDING
    (not empty like DuckDB's generate_series), so every n-gram helper
    must guard short inputs — a 1-word doc yields NO n-grams."""
    from pyspark.sql import functions as F

    from stacktrend_spark.plans.selection import _word_ngrams

    df = spark.createDataFrame(
        [(1, ["solo"]), (2, ["a", "b", "c", "d"])], "doc_id long, w array<string>"
    )
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", _word_ngrams("w", 3).alias("g")).collect()
    }
    assert out[1] == []
    assert out[2] == ["a b c", "b c d"]
    # the raw-text bigram guard: 1-char text explodes to zero bigrams
    docs = spark.createDataFrame([("x",), ("ab cd",)], "text string")
    n = (
        docs.filter(F.length("text") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 1),"
                    " i -> substring(text, i, 2))"
                )
            ).alias("bg")
        )
        .count()
    )
    assert n == 4  # only from 'ab cd'
