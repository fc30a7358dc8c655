"""Driver-gate queries for the round-3 reference-parity APIs: keyword
extraction (dt:301-318), the validation-rules ledger (med:205-278), the
seeded search-query generator (gdi:104-172), and the master-pipeline
entry points (dfp:14-222 / prdfp:14-222).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.keywords import TECH_KEYWORDS, extract_keywords
from stacktrend_spark.pipelines.validation import Rule, violation_counts
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.search_gen import randomized_search_queries
from stacktrend_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Keyword extraction over the documents table. The document's lang and
# source stand in for GitHub topics; both are already lowercase and
# their value domains are disjoint from TECH_KEYWORDS and from each
# other, so the Spark side's array_distinct is a no-op here and the
# oracle can skip mirroring it (DuckDB's list_distinct does not pin
# first-occurrence order). Emitted as a CSV string so the hash is
# array-encoding-agnostic.
# ---------------------------------------------------------------------------

_KW_LIST_SQL = "[" + ", ".join(f"'{k}'" for k in TECH_KEYWORDS) + "]"


@register(
    "silver_keyword_extraction",
    oracle=f"""
        SELECT doc_id,
            array_to_string(
                list_slice(
                    list_cat(
                        [lower(trim(lang)), lower(trim(source))],
                        list_filter({_KW_LIST_SQL}, k -> contains(lower(text), k))
                    ),
                    1, 10
                ),
            ',') AS keywords_csv
        FROM documents
    """,
    doc="Keyword extraction (dt:301-318) as pure array/string exprs: topics + matched tech vocabulary, capped at 10.",
)
def silver_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kw = extract_keywords(F.col("text"), F.array(F.col("lang"), F.col("source")))
    return docs.select("doc_id", F.array_join(kw, ",").alias("keywords_csv"))


# ---------------------------------------------------------------------------
# Validation-rules ledger applied to the orders table: required-field,
# positivity, domain-membership and range rules in ONE aggregate pass
# (the reference validates row-at-a-time driver-side, med:212-234).
# The price-cap rule genuinely fires on the testdata so the query
# proves non-zero counts, not just zeros.
# ---------------------------------------------------------------------------

_ORDER_RULES = [
    Rule("required_orderkey", "orders", "o_orderkey IS NOT NULL", ("o_orderkey",)),
    Rule("orderkey_positive", "orders", "o_orderkey > 0", ("o_orderkey",)),
    Rule("required_custkey", "orders", "o_custkey IS NOT NULL", ("o_custkey",)),
    Rule("totalprice_non_negative", "orders", "o_totalprice >= 0", ("o_totalprice",)),
    Rule("totalprice_under_cap", "orders", "o_totalprice <= 300000", ("o_totalprice",)),
    Rule(
        "status_in_domain",
        "orders",
        "o_orderstatus IN ('O', 'F', 'P')",
        ("o_orderstatus",),
    ),
    Rule("priority_shape", "orders", "o_orderpriority LIKE '%-%'", ("o_orderpriority",)),
    Rule("missing_column_probe", "orders", "no_such_column IS NOT NULL", ("no_such_column",)),
]


def _rule_count_sql(r: Rule) -> str:
    if r.name == "missing_column_probe":
        # med:219-222: absent column → every row violates
        cond = "TRUE"
    else:
        cond = f"NOT COALESCE(({r.check}), FALSE)"
    return (
        f"SELECT '{r.layer}' AS layer, '{r.name}' AS rule_name, "
        f"CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT) AS n_violations FROM orders"
    )


@register(
    "validation_violations",
    oracle=" UNION ALL ".join(_rule_count_sql(r) for r in _ORDER_RULES),
    doc="Validation rules ledger (med:205-278): per-rule violation counts in one aggregate pass.",
)
def validation_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return violation_counts(orders, _ORDER_RULES)


# ---------------------------------------------------------------------------
# Seeded search-query plan (gdi:104-172). The oracle is the literal
# expected plan for the pinned seed — both sides re-derive nothing from
# each other: Spark serializes the generator's dataclasses through
# createDataFrame; the oracle pins the frozen values, so any drift in
# pool contents, draw order, or page sampling breaks the hash.
# ---------------------------------------------------------------------------

_PLAN_SEED = 7
_PLAN = randomized_search_queries(_PLAN_SEED)


def _plan_values_sql() -> str:
    rows = ", ".join(
        "({}, '{}', '{}', '{}', '{}', {})".format(
            i,
            q.query,
            q.sort,
            q.order,
            ",".join(str(p) for p in q.pages),
            "TRUE" if q.guaranteed else "FALSE",
        )
        for i, q in enumerate(_PLAN)
    )
    return (
        "SELECT CAST(idx AS BIGINT) AS idx, query, sort_field, sort_order, "
        "pages, guaranteed FROM (VALUES "
        + rows
        + ") AS t(idx, query, sort_field, sort_order, pages, guaranteed)"
    )


@register(
    "search_query_plan",
    oracle=_plan_values_sql(),
    doc="Seeded 12-random + 2-guaranteed search-query mix (gdi:104-156) with 3-of-5 page sampling (gdi:170).",
)
def search_query_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (
            i,
            q.query,
            q.sort,
            q.order,
            ",".join(str(p) for p in q.pages),
            q.guaranteed,
        )
        for i, q in enumerate(randomized_search_queries(_PLAN_SEED))
    ]
    return spark.createDataFrame(
        rows,
        "idx long, query string, sort_field string, sort_order string, "
        "pages string, guaranteed boolean",
    )


# ---------------------------------------------------------------------------
# Master-pipeline entry points, run end-to-end against a throwaway
# MedallionStore on the deterministic fixtures. Multi-stage stateful
# storage composition is not SQL-expressible — registered without an
# oracle (driver records the rows-only check); the value-level goldens
# live in tests/test_orchestration.py.
# ---------------------------------------------------------------------------


@register(
    "pipeline_trend_gold",
    oracle=None,
    doc="run_trend_pipeline (dfp:14-173): bronze→silver→7 gold tables against a MedallionStore; returns gold.tech_metrics.",
)
def pipeline_trend_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.pipelines.fixtures import AS_OF_DATE, bronze_repos
    from stacktrend_spark.pipelines.medallion import MedallionStore
    from stacktrend_spark.pipelines.orchestration import run_trend_pipeline

    store = MedallionStore(tempfile.mkdtemp(prefix="trend_store_"))
    out = run_trend_pipeline(spark, store, bronze_repos(spark), AS_OF_DATE)
    return out["gold.tech_metrics"].orderBy("technology_category")


@register(
    "pipeline_personal_gold",
    oracle=None,
    doc="run_personal_pipeline (prdfp:14-222): repos+activity bronze→silver→3 portfolio gold tables; returns gold.development_velocity.",
)
def pipeline_personal_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.pipelines.fixtures import (
        AS_OF_DATE,
        bronze_activity,
        bronze_repos,
    )
    from stacktrend_spark.pipelines.medallion import MedallionStore
    from stacktrend_spark.pipelines.orchestration import run_personal_pipeline

    repos = bronze_repos(spark, n=120)
    ids = [r.repository_id for r in repos.select("repository_id").collect()]
    store = MedallionStore(tempfile.mkdtemp(prefix="personal_store_"))
    out = run_personal_pipeline(
        spark, store, repos, bronze_activity(spark, ids, n=800), AS_OF_DATE
    )
    return out["gold.development_velocity"].orderBy("repository_id")
