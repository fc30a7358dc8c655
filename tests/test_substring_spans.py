"""ExactSubstr duplicated-span coverage (r9): pins the operator's
semantics against an independent pure-Python reimplementation and its
structural output contract — the complement to the oracle-parity gate
(which checks the SQL twin, not the definition)."""

from __future__ import annotations

from stacktrend_spark.plans.curation import _SPAN_K, dedup_substring_spans


def _brute_coverage(texts: dict[int, str], k: int) -> dict[int, tuple[int, int]]:
    """(covered_chars, n_spans) per doc via the literal definition:
    a position is covered iff its k-gram occurs in >= 2 distinct docs;
    spans are maximal runs of covered characters."""
    gram_docs: dict[str, set[int]] = {}
    for d, t in texts.items():
        for p in range(len(t) - k + 1):
            gram_docs.setdefault(t[p : p + k], set()).add(d)
    out: dict[int, tuple[int, int]] = {}
    for d, t in texts.items():
        covered = [False] * len(t)
        for p in range(len(t) - k + 1):
            if len(gram_docs[t[p : p + k]]) >= 2:
                for i in range(p, p + k):
                    covered[i] = True
        total = sum(covered)
        if total == 0:
            continue
        n_spans = sum(
            1 for i, c in enumerate(covered) if c and (i == 0 or not covered[i - 1])
        )
        out[d] = (total, n_spans)
    return out


def test_substring_spans_match_bruteforce(spark, sf_dir):
    rows = {r["doc_id"]: r for r in dedup_substring_spans(spark, sf_dir).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    expect = _brute_coverage(texts, _SPAN_K)
    assert set(rows) == set(expect), "covered-doc set must match brute force"
    for d, (covered, n_spans) in expect.items():
        assert rows[d]["covered_chars"] == covered
        assert rows[d]["n_spans"] == n_spans
        assert rows[d]["doc_len"] == len(texts[d])
        assert rows[d]["coverage_bp"] == 10000 * covered // len(texts[d])


def test_substring_spans_output_contract(spark, sf_dir):
    rows = dedup_substring_spans(spark, sf_dir).collect()
    assert rows, "the corpus plants cross-doc duplicate spans"
    for r in rows:
        # every island is a maximal duplicated run >= K chars
        assert r["n_spans"] >= 1
        assert r["covered_chars"] >= r["n_spans"] * _SPAN_K
        assert r["covered_chars"] <= r["doc_len"]
        assert 0 < r["coverage_bp"] <= 10000
