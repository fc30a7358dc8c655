"""Language-distribution as a pure column expression.

Reproduces ``extract_language_distribution`` (bronze_to_silver_
transformation.py:403-445), which the reference runs as a row-at-a-time
Python UDF (b2s:616-618) — here it is Spark SQL higher-order functions
end-to-end (SURVEY §2.9 F1 ⟲): codegen-friendly, no Python workers.

Reference semantics preserved exactly:
- a non-empty primary language (not 'null'/'none') gets 70%;
- every topic containing a known language keyword appends that
  language's display name (duplicates INCLUDED — they dilute the
  per-language share, a reference quirk we keep);
- unique topic languages (first-occurrence order) split the remaining
  30% (100% if no primary) divided by the OCCURRENCE count;
- a topic language equal (exact string) to the primary key is skipped;
- nothing found → {'Unknown': 100.0};
- values normalized to sum 100, rounded half-even to 1 decimal
  (Python round == Spark bround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: keyword → display name (b2s:412-419), insertion order significant
PROGRAMMING_LANGUAGES: tuple[tuple[str, str], ...] = (
    ("python", "Python"), ("javascript", "JavaScript"), ("typescript", "TypeScript"),
    ("java", "Java"), ("go", "Go"), ("rust", "Rust"), ("cpp", "C++"), ("c++", "C++"),
    ("csharp", "C#"), ("c#", "C#"), ("php", "PHP"), ("ruby", "Ruby"),
    ("swift", "Swift"), ("kotlin", "Kotlin"), ("scala", "Scala"), ("r", "R"),
    ("julia", "Julia"), ("shell", "Shell"), ("bash", "Shell"),
    ("dockerfile", "Dockerfile"), ("yaml", "YAML"), ("json", "JSON"), ("sql", "SQL"),
)


def language_distribution(
    language: Column, topics: Column, round_fn=None
) -> Column:
    """Map<String,Double> of estimated language shares (sums to ~100).

    ``round_fn(col) -> col`` overrides the final per-share rounding;
    default is the reference's ``bround(x, 1)`` (Python round,
    half-even). The oracle-checked query passes the shared
    deterministic half-up formula instead, because DuckDB's ROUND is
    half-up and the two differ on exactly-representable ties."""
    if round_fn is None:
        round_fn = lambda v: F.bround(v, 1)  # noqa: E731
    # one F.expr parse instead of ~70 py4j expression-builder calls:
    # the SQL parser yields the identical array<struct<key,name>>
    # literal tree, but driver-side construction drops from ~0.25 s to
    # ~ms per call — this expression is rebuilt on every build_silver
    # (r13 optimization; measured in OPTIMIZATION_r13.md)
    lang_pairs = F.expr(
        "array("
        + ", ".join(
            f"struct('{k}' AS key, '{v}' AS name)"
            for k, v in PROGRAMMING_LANGUAGES
        )
        + ")"
    )
    # per topic: all matching display names, in rule order; flattened in
    # topic order — matches the reference's nested-loop append order
    matched = F.flatten(
        F.transform(
            F.coalesce(topics, F.array()),
            lambda t: F.transform(
                F.filter(lang_pairs, lambda p: F.lower(t).contains(p["key"])),
                lambda p: p["name"],
            ),
        )
    )
    has_primary = (
        language.isNotNull()
        & (F.trim(language) != "")
        & ~F.lower(language).isin("null", "none")
    )
    n_occurrences = F.size(matched)
    remaining = F.when(has_primary, F.lit(30.0)).otherwise(F.lit(100.0))
    per_lang = remaining / n_occurrences.cast("double")
    # unique topic languages in first-occurrence order, minus an exact
    # string match of the primary key (the reference keys primaries by
    # the RAW language value, so only exact equality collides)
    uniq = F.array_distinct(matched)
    uniq_minus_primary = F.when(
        has_primary, F.array_remove(uniq, language)
    ).otherwise(uniq)

    keys_with_primary = F.concat(F.array(language), uniq_minus_primary)
    vals_with_primary = F.concat(
        F.array(F.lit(70.0)), F.transform(uniq_minus_primary, lambda _: per_lang)
    )
    keys = (
        F.when(has_primary & (n_occurrences > 0), keys_with_primary)
        .when(has_primary, F.array(language))
        .when(n_occurrences > 0, uniq_minus_primary)
        .otherwise(F.array(F.lit("Unknown")))
    )
    vals = (
        F.when(has_primary & (n_occurrences > 0), vals_with_primary)
        .when(has_primary, F.array(F.lit(70.0)))
        .when(n_occurrences > 0, F.transform(uniq_minus_primary, lambda _: per_lang))
        .otherwise(F.array(F.lit(100.0)))
    )
    total = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
    normalized = F.transform(vals, lambda v: round_fn(v / total * 100.0))
    return F.map_from_arrays(keys, normalized)
