"""Round-3 reference-parity APIs: search-query generator (gdi:104-172),
keyword extraction (dt:301-318), validation ledger (med:205-278), and
the master-pipeline entry points (dfp:14-222)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stacktrend_spark.functions.keywords import TECH_KEYWORDS, extract_keywords
from stacktrend_spark.pipelines.fixtures import (
    AS_OF_DATE,
    bronze_activity,
    bronze_repos,
)
from stacktrend_spark.pipelines.medallion import MedallionStore
from stacktrend_spark.pipelines.orchestration import (
    TREND_GOLD_TABLES,
    run_personal_pipeline,
    run_trend_pipeline,
)
from stacktrend_spark.pipelines.validation import (
    BRONZE_RULES,
    Rule,
    violation_counts,
    violations,
)
from stacktrend_spark.sources.search_gen import (
    BASE_CATEGORIES,
    SORT_STRATEGIES,
    TIME_FILTERS,
    randomized_search_queries,
)

# ---------------------------------------------------------------------------
# search-query generator
# ---------------------------------------------------------------------------


def test_search_plan_shape_matches_reference_mix():
    """gdi:139-156: 12 randomized + 2 guaranteed, every randomized query
    = category + star floor + time filter, sort from the strategy pool."""
    plan = randomized_search_queries(seed=123)
    assert len(plan) == 14
    randoms, guaranteed = plan[:12], plan[12:]
    assert all(not q.guaranteed for q in randoms)
    assert [q.query for q in guaranteed] == [
        "stars:>10000+created:>2023-01-01",
        "stars:>5000+updated:>2024-06-01",
    ]
    sorts = {s for s, _ in SORT_STRATEGIES}
    for q in randoms:
        category, star, tfilter = q.query.rsplit("+", 2)
        assert category in BASE_CATEGORIES
        assert star.startswith("stars:>") and int(star[7:]) in (1000, 1500, 2000, 5000)
        assert tfilter in TIME_FILTERS
        assert q.sort in sorts and q.order == "desc"


def test_search_plan_page_sampling_and_determinism():
    a = randomized_search_queries(seed=9)
    b = randomized_search_queries(seed=9)
    c = randomized_search_queries(seed=10)
    assert a == b
    assert a != c
    for q in a:
        assert len(q.pages) == 3 and len(set(q.pages)) == 3
        assert all(1 <= p <= 5 for p in q.pages)


# ---------------------------------------------------------------------------
# keyword extraction
# ---------------------------------------------------------------------------


def test_extract_keywords_golden(spark):
    df = spark.createDataFrame(
        [
            ("A data tool with an API for analytics", ["Python", "ML", "API", "x", "y", "z"]),
            (None, ["solo"]),
            ("nothing matches here!", None),
        ],
        "description string, topics array<string>",
    )
    rows = df.select(
        extract_keywords(F.col("description"), F.col("topics")).alias("kw")
    ).collect()
    # ≤5 topics first (lowercased, input order), then matched keywords in
    # vocabulary order, dedup keeps first occurrence, cap 10
    assert rows[0].kw == ["python", "ml", "api", "x", "y", "tool", "data", "analytics"]
    assert rows[1].kw == ["solo"]
    assert rows[2].kw == []


def test_extract_keywords_cap_ten(spark):
    text = " ".join(TECH_KEYWORDS)  # all 13 match
    df = spark.createDataFrame([(text, ["t1", "t2", "t3", "t4", "t5", "t6"])],
                               "description string, topics array<string>")
    (row,) = df.select(extract_keywords("description", "topics").alias("kw")).collect()
    assert len(row.kw) == 10
    assert row.kw[:5] == ["t1", "t2", "t3", "t4", "t5"]  # topics capped at 5 first


# ---------------------------------------------------------------------------
# validation ledger
# ---------------------------------------------------------------------------


def test_violations_per_record_and_missing_column(spark):
    df = spark.createDataFrame(
        [(1, "ok", 5), (2, None, -1), (None, "x", 0)],
        "repository_id long, name string, stargazers_count long",
    )
    rules = [
        Rule("required_repository_id", "bronze", "repository_id IS NOT NULL", ("repository_id",)),
        Rule("required_name", "bronze", "name IS NOT NULL", ("name",)),
        Rule("stars_non_negative", "bronze", "stargazers_count >= 0", ("stargazers_count",)),
        Rule("required_owner_login", "bronze", "owner_login IS NOT NULL", ("owner_login",)),
    ]
    out = violations(df, rules, key="repository_id").collect()
    got = {(r.repository_id, r.rule_name) for r in out}
    # absent column → every row violates (med:219-222)
    assert got == {
        (2, "required_name"),
        (2, "stars_non_negative"),
        (None, "required_repository_id"),
        (1, "required_owner_login"),
        (2, "required_owner_login"),
        (None, "required_owner_login"),
    }
    counts = {
        (r.rule_name): r.n_violations
        for r in violation_counts(df, rules).collect()
    }
    assert counts == {
        "required_repository_id": 1,
        "required_name": 1,
        "stars_non_negative": 1,
        "required_owner_login": 3,
    }


def test_bronze_rules_flag_fixture_edge_cases(spark):
    counts = {
        r.rule_name: r.n_violations
        for r in violation_counts(bronze_repos(spark), BRONZE_RULES).collect()
    }
    # fixtures plant null names every i%50==7 (fixtures.py:44)
    assert counts["required_name"] > 0
    assert counts["repo_id_positive"] == 0
    assert counts["stars_non_negative"] == 0


# ---------------------------------------------------------------------------
# master pipelines
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def trend_out(spark_module, tmp_path_factory):
    spark = spark_module
    store = MedallionStore(str(tmp_path_factory.mktemp("trend")))
    return run_trend_pipeline(spark, store, bronze_repos(spark), AS_OF_DATE), store


def test_trend_pipeline_materializes_all_layers(spark, trend_out):
    out, store = trend_out
    for t in TREND_GOLD_TABLES:
        assert store.exists("gold", t), t
        assert out[f"gold.{t}"].count() > 0, t
    assert store.exists("silver", "github_curated")
    # quarantine caught the planted bad-name rows
    assert out["silver.github_quarantine"].count() > 0


def test_trend_pipeline_rerun_is_idempotent(spark, trend_out):
    out, store = trend_out
    first = out["gold.tech_metrics"].orderBy("technology_category").collect()
    again = run_trend_pipeline(spark, store, bronze_repos(spark), AS_OF_DATE)
    second = again["gold.tech_metrics"].orderBy("technology_category").collect()
    assert first == second


def test_personal_pipeline_end_to_end(spark, tmp_path):
    repos = bronze_repos(spark, n=120)
    ids = [r.repository_id for r in repos.select("repository_id").collect()]
    store = MedallionStore(str(tmp_path / "personal"))
    out = run_personal_pipeline(
        spark, store, repos, bronze_activity(spark, ids, n=800), AS_OF_DATE
    )
    for t in ("portfolio_overview", "repo_health_dashboard", "development_velocity"):
        assert store.exists("gold", t), t
        assert out[f"gold.{t}"].count() > 0, t


def test_extract_keywords_matches_python_reference(spark):
    """Seeded random corpus vs an independent Python reference of the
    pinned semantics (topics[:5] lowered in order, then vocabulary-order
    matches, first-occurrence dedup, cap 10)."""
    import random

    rng = random.Random(77)
    words = ["Api", "zeta", "DATA", "ml", "toolbox", "web", "x1", "Framework", "cli"]
    rows = []
    for _ in range(60):
        desc = (
            None
            if rng.random() < 0.15
            else " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        )
        topics = (
            None
            if rng.random() < 0.15
            else [rng.choice(words) + str(rng.randint(0, 3)) for _ in range(rng.randint(0, 8))]
        )
        rows.append((desc, topics))

    def ref(desc, topics):
        out = []
        for t in (topics or [])[:5]:
            t = t.strip().lower()
            if t not in out:
                out.append(t)
        d = (desc or "").lower()
        for k in TECH_KEYWORDS:
            if k in d and k not in out:
                out.append(k)
        return out[:10]

    df = spark.createDataFrame(rows, "description string, topics array<string>")
    got = df.select(
        extract_keywords(F.col("description"), F.col("topics")).alias("kw")
    ).collect()
    for (desc, topics), row in zip(rows, got):
        assert row.kw == ref(desc, topics), (desc, topics)


def test_violation_counts_consistent_with_explode(spark):
    """The one-aggregate counts and the per-record explode must agree
    on every rule over the fixture corpus."""
    df = bronze_repos(spark)
    counts = {
        r.rule_name: r.n_violations
        for r in violation_counts(df, BRONZE_RULES).collect()
    }
    exploded = (
        violations(df, BRONZE_RULES, key="repository_id")
        .groupBy("rule_name")
        .count()
        .collect()
    )
    from_explode = {r.rule_name: r["count"] for r in exploded}
    for name, n in counts.items():
        assert from_explode.get(name, 0) == n, name
