"""Text-analysis operators for training-data pipelines (north-star
surface, BASELINE.json): token statistics, quality scoring, heuristic
language ID, document fingerprinting.

All pure column expressions (whole-stage codegen, no Python) with
exact arithmetic: every ratio is an int/int double division, every
score routed through deterministic rounding — so each operator is
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import fround

#: tiny deterministic marker lexicons for heuristic language ID.
#: Real pipelines plug a trained identifier behind the same operator
#: signature; the heuristic keeps the Spark-side plumbing honest and
#: testable without model weights.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "and", "or", "is", "in", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: counts, distinct counts,
    type-token ratio, exact average token length."""
    t = tokens(F.col(text_col))
    char_sum = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
        fround(
            F.size(F.array_distinct(t)).cast("double") / F.size(t).cast("double"), 6
        ).alias("type_token_ratio"),
        fround(char_sum.cast("double") / F.size(t).cast("double"), 6).alias(
            "avg_token_len"
        ),
    )


#: BPE-ish pre-tokenization regex: letter runs, digit runs, and single
#: non-space symbols — the standard pre-split (GPT-2 style, simplified
#: to a class-based pattern whose semantics are identical in Java regex
#: and RE2/DuckDB, so the operator stays oracle-checkable).
BPE_PRETOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def regex_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document counts under BPE-ish regex pre-tokenization:
    total pieces, word pieces, number pieces, symbol pieces. A real BPE
    tokenizer's merge step would run as a Pandas UDF downstream of this
    split; the counting path stays JVM-side."""
    # F.regexp_extract_all with a lit pattern, NOT F.expr: a SQL string
    # literal would re-process backslash escapes ('\s' -> 's')
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_PRETOKEN_RE), 0
    )
    n_words = F.size(F.filter(pieces, lambda p: p.rlike("^[a-z]+$")))
    n_nums = F.size(F.filter(pieces, lambda p: p.rlike("^[0-9]+$")))
    return df.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("n_pieces"),
        n_words.cast("long").alias("n_word_pieces"),
        n_nums.cast("long").alias("n_number_pieces"),
        (F.size(pieces) - n_words - n_nums).cast("long").alias("n_symbol_pieces"),
    )


def count_matches(text: Column, words: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in ``words`` (frequency-weighted),
    via a codegen'd filter over the token array."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda x: F.array_contains(arr, x))).cast(
        "long"
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality scoring: length, stopword ratio,
    punctuation density → 0-100 composite + tier. Mirrors the
    reference's additive scorecard pattern
    (bronze_to_silver_transformation.py:769-782) on text features."""
    text = F.col(text_col)
    t = tokens(text)
    n_tokens = F.size(t).cast("double")
    n_chars = F.length(text).cast("double")
    n_stop = count_matches(text, STOPWORDS).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", "")).cast("double")
    )
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    length_score = F.least(F.lit(40.0), n_tokens / 2.0)
    stop_score = F.least(F.lit(30.0), stop_ratio * 300.0)
    punct_penalty = F.least(F.lit(20.0), punct_ratio * 100.0)
    score = F.least(
        F.lit(100.0),
        F.greatest(F.lit(0.0), length_score + stop_score - punct_penalty + F.lit(30.0)),
    )
    scored = df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        fround(stop_ratio, 6).alias("stopword_ratio"),
        fround(punct_ratio, 6).alias("punct_ratio"),
        fround(score, 6).alias("quality_score"),
    )
    q = F.col("quality_score")
    return scored.withColumn(
        "quality_tier",
        F.when(q >= 80, "high").when(q >= 55, "medium").otherwise("low"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic n-gram/marker language ID: score = marker-token hits
    per language, predicted = argmax (ties broken by language code).
    Returns per-doc scores + prediction."""
    text = F.col(text_col)
    langs = sorted(LANG_MARKERS)
    scores = {lang: count_matches(text, LANG_MARKERS[lang]) for lang in langs}
    out = df.select(
        F.col(id_col), *[scores[lang].alias(f"score_{lang}") for lang in langs]
    )
    # argmax with deterministic tiebreak: highest score, then lang asc
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:  # first (alphabetically) language hitting the max wins
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return out.withColumn("predicted_lang", pred)


def fingerprint(
    shingled: DataFrame, id_col: str, num_fingerprints: int = 2
) -> DataFrame:
    """Winnowing-style document fingerprints from a (id, shingle)
    posting list: k independent min-digests (salted md5). Equal
    fingerprints ⇒ near-identical shingle sets — usable as a cheap
    near-dup blocking key."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"fp{i}|"), F.col("shingle")))).alias(f"fp{i}")
        for i in range(num_fingerprints)
    ]
    return shingled.groupBy(id_col).agg(*aggs)
