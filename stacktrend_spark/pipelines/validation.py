"""Validation rules as a first-class, callable API.

The reference's ``SchemaValidation`` (medallion_architecture.py:205-278)
exposes per-layer validators that take ONE record dict and return a
list of issue strings — driver-side, row-at-a-time. Here the same rule
semantics are a declarative ledger applied to a whole DataFrame in one
distributed pass:

- ``Rule``: a named boolean column expression (TRUE = valid) tied to a
  layer; missing-column rules degrade to "column absent" violations
  instead of raising, mirroring the reference's ``field not in record``
  branch.
- ``violations(df, rules)``: one output row per (row, failed rule) —
  the exact per-record issue list of the reference, distributed. Built
  as ONE projection producing an array of failed rule names +
  ``explode`` — a single map-side pass, no joins, no UDFs; at 100 TB
  the cost is one scan.
- ``violation_counts(df, rules)``: the audit summary — one row per
  rule with its violation count (zero included), a single aggregate.

Default ledgers mirror med:212-278: bronze required fields and
non-negative/positive integer checks, silver 0-100 score ranges and
non-negative velocities, gold momentum range and positive ranks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    layer: str
    #: boolean SQL expression over the layer's columns; TRUE = valid
    check: str
    #: columns the check needs; if any is absent the rule reports a
    #: missing-column violation for every row (med:219-222 semantics)
    requires: tuple[str, ...] = ()


def _rule_col(df: DataFrame, rule: Rule) -> Column:
    """TRUE = this row violates ``rule`` (inverted so nulls count as
    violations, matching the reference's ``is None`` checks)."""
    missing = [c for c in rule.requires if c not in df.columns]
    if missing:
        return F.lit(True)
    valid = F.expr(rule.check)
    return ~F.coalesce(valid, F.lit(False))


def violations(df: DataFrame, rules: list[Rule], key: str) -> DataFrame:
    """One row per (record, violated rule): (key, rule_name, layer).

    Single projection + explode — the per-record issue lists of
    med:212-278, produced in one distributed map pass.
    """
    tagged = F.array_compact(
        F.array(
            *[
                F.when(_rule_col(df, r), F.lit(f"{r.layer}:{r.name}"))
                for r in rules
            ]
        )
    )
    return (
        df.select(F.col(key), F.explode(tagged).alias("violation"))
        .withColumn("layer", F.split(F.col("violation"), ":").getItem(0))
        .withColumn("rule_name", F.split(F.col("violation"), ":").getItem(1))
        .drop("violation")
    )


def violation_counts(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Audit summary: (layer, rule_name, n_violations) — one aggregate
    pass, all rules evaluated map-side, zero counts preserved."""
    aggs = [
        # coalesce: SUM over zero rows is NULL, but an empty layer has
        # zero violations (matches COUNT(*) FILTER oracle semantics)
        F.coalesce(F.sum(_rule_col(df, r).cast("long")), F.lit(0).cast("long")).alias(
            f"{r.layer}:{r.name}"
        )
        for r in rules
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.layer).alias("layer"),
                F.lit(r.name).alias("rule_name"),
                F.col(f"`{r.layer}:{r.name}`").alias("n_violations"),
            )
            for r in rules
        ]
    )
    return wide.select(F.inline(pairs))


# ---------------------------------------------------------------------------
# Default ledgers (med:212-278). Check strings are Spark SQL boolean
# expressions; ``requires`` lists the columns they touch.
# ---------------------------------------------------------------------------

BRONZE_RULES = [
    *[
        Rule(f"required_{c}", "bronze", f"{c} IS NOT NULL", (c,))
        for c in (
            "repository_id",
            "name",
            "full_name",
            "owner_login",
            "created_at",
            "stargazers_count",
            "ingestion_timestamp",
        )
    ],
    Rule("stars_non_negative", "bronze", "stargazers_count >= 0", ("stargazers_count",)),
    Rule("repo_id_positive", "bronze", "repository_id > 0", ("repository_id",)),
]

SILVER_RULES = [
    Rule(
        "community_health_score_range",
        "silver",
        "community_health_score BETWEEN 0 AND 100",
        ("community_health_score",),
    ),
    Rule(
        "quality_score_range",
        "silver",
        "quality_score BETWEEN 0 AND 100",
        ("quality_score",),
    ),
    Rule(
        "commit_frequency_non_negative",
        "silver",
        "commit_frequency_30d >= 0",
        ("commit_frequency_30d",),
    ),
    Rule(
        "star_velocity_non_negative",
        "silver",
        "star_velocity_30d >= 0",
        ("star_velocity_30d",),
    ),
]

GOLD_RULES = [
    Rule(
        "momentum_score_range",
        "gold",
        "momentum_score BETWEEN 0 AND 100",
        ("momentum_score",),
    ),
    *[
        Rule(f"{c}_positive", "gold", f"{c} > 0", (c,))
        for c in ("popularity_rank", "growth_rank", "health_rank", "overall_rank")
    ],
]
