"""Invariant tests for the resampling layer (plans/resampling.py).

Value-exactness against DuckDB is covered by the oracle-parity sweep;
these pin STRUCTURAL guarantees — the target slice never resamples
itself, surprisal is bounded by the µlog10 scale, fertility ratios obey
the encoding arithmetic — which a value-identical-but-wrong oracle
pair could not catch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stacktrend_spark.plans.resampling import (
    _DSIR_TOPK,
    _TARGET_LANG,
    dsir_importance_resampling,
    tokenizer_fertility_panel,
    unigram_surprisal_filter,
)
from stacktrend_spark.sources.tables import load_table

# heavy tier: excluded from the core gate (see pytest.ini)
pytestmark = pytest.mark.slow


def test_dsir_excludes_target_and_ranks_cleanly(spark, sf_dir):
    rows = dsir_importance_resampling(spark, sf_dir).collect()
    assert len(rows) == _DSIR_TOPK
    assert all(r["lang"] != _TARGET_LANG for r in rows)
    assert sorted(r["rnk"] for r in rows) == list(range(1, _DSIR_TOPK + 1))
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a["weight_micro"], -a["doc_id"]) >= (b["weight_micro"], -b["doc_id"])


def test_surprisal_covers_corpus_with_bounded_values(spark, sf_dir):
    out = unigram_surprisal_filter(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    bad = out.filter(
        (F.col("mean_surprisal_micro") < 0)
        | (F.col("mean_surprisal_micro") > 6000000)
        | (
            (F.col("mean_surprisal_micro") <= 3200000)
            & (F.col("ppl_tier") != "keep")
        )
        | (
            (F.col("mean_surprisal_micro") > 4200000)
            & (F.col("ppl_tier") != "discard")
        )
    ).count()
    assert bad == 0


def test_fertility_encoding_arithmetic(spark, sf_dir):
    rows = {r["lang"]: r for r in tokenizer_fertility_panel(spark, sf_dir).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    for r in rows.values():
        # UTF-8: every char is at least one octet
        assert r["n_octets"] >= r["n_chars"]
        assert r["octets_per_char_micro"] >= 1000000
        # the subword regex never merges across whitespace, and every
        # non-space char lands in some piece -> at least one piece per
        # whitespace token of any non-degenerate doc
        assert r["fertility_micro"] >= 1000000
        # subword pieces never span whitespace and never split a pure
        # letter run, so pieces <= non-space chars
        assert r["subword_tokens"] <= r["n_chars"] - (r["ws_tokens"] - r["n_docs"])
    # the synthetic corpus is ASCII words for every lang label, so the
    # encoding ratios collapse to exactly 1.0 — pin that so a corpus
    # regeneration with real multibyte text shows up as a test diff,
    # not silence (real CJK would push both ratios well above 1e6)
    assert all(r["octets_per_char_micro"] == 1000000 for r in rows.values())
