"""Canonical schemas — the single source of truth for every layer.

The reference's schemas drifted: ingestion writes bronze `github_repos`
(github_data_ingestion.py:355,397) but the silver notebook reads
`github_repositories` (bronze_to_silver_transformation.py:630,639), and
its dataclass "docs" (medallion_architecture.py:41-148) are never
imported. This module fixes SURVEY §1.3: one importable schema per
table, used by the fixture generator, the transforms, and the tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

# table names (unified — SURVEY §4 anti-pattern 6)
BRONZE_REPOS = "github_repos"
BRONZE_MY_REPOS = "github_my_repos"
BRONZE_ACTIVITY = "github_repo_activity"
SILVER_CURATED = "github_curated"
SILVER_PORTFOLIO = "github_my_portfolio"
SILVER_ACTIVITY_METRICS = "github_activity_metrics"

#: bronze trend-pipeline repositories
#: (github_data_ingestion.py:258-284 StructType + :295-322 projection)
BRONZE_REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repository_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("full_name", T.StringType(), True),
        T.StructField("owner_login", T.StringType(), True),
        T.StructField("owner_type", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("pushed_at", T.TimestampType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("stargazers_count", T.LongType(), True),
        T.StructField("watchers_count", T.LongType(), True),
        T.StructField("forks_count", T.LongType(), True),
        T.StructField("open_issues_count", T.LongType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("default_branch", T.StringType(), True),
        T.StructField("topics", T.ArrayType(T.StringType()), True),
        T.StructField("license_name", T.StringType(), True),
        T.StructField("has_wiki", T.BooleanType(), True),
        T.StructField("has_pages", T.BooleanType(), True),
        T.StructField("archived", T.BooleanType(), True),
        T.StructField("disabled", T.BooleanType(), True),
        T.StructField("ingestion_timestamp", T.TimestampType(), True),
        T.StructField("partition_date", T.StringType(), True),
    ]
)

#: bronze activity events (personal_repos_ingestion.py:375-388)
BRONZE_ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("repository_id", T.LongType(), False),
        T.StructField("activity_type", T.StringType(), False),
        T.StructField("activity_id", T.StringType(), False),
        T.StructField("author_login", T.StringType(), True),
        T.StructField("activity_date", T.TimestampType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("additions", T.LongType(), True),
        T.StructField("deletions", T.LongType(), True),
        T.StructField("changed_files", T.LongType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("ingestion_timestamp", T.TimestampType(), True),
        T.StructField("partition_date", T.StringType(), True),
    ]
)

#: classification output (llm_classifier.py:112-123 parsed-response shape)
CLASSIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("repository_id", T.LongType(), False),
        T.StructField("technology_category", T.StringType(), False),
        T.StructField("technology_subcategory", T.StringType(), False),
        T.StructField("classification_confidence", T.DoubleType(), False),
    ]
)

#: the 10-category taxonomy (llm_classifier.py:63-73)
CATEGORIES = (
    "AI",
    "ML",
    "DataEngineering",
    "Databases",
    "WebDevelopment",
    "DevOps",
    "CloudServices",
    "Security",
    "ProgrammingLanguages",
    "Other",
)

#: silver curated final projection, 29 columns
#: (bronze_to_silver_transformation.py:822-853)
SILVER_COLUMNS = [
    "repository_id",
    "name",
    "name_clean",
    "full_name",
    "owner_login",
    "owner_type",
    "description_clean",
    "primary_language",
    "language_distribution",
    "topics_standardized",
    "keywords",
    "technology_category",
    "technology_subcategory",
    "classification_confidence",
    "license_category",
    "stargazers_count",
    "watchers_count",
    "forks_count",
    "open_issues_count",
    "size",
    "days_since_push",
    "days_since_creation",
    "is_active",
    "star_velocity_30d",
    "commit_frequency_30d",
    "community_health_score",
    "quality_score",
    "data_quality_flags",
    "processed_timestamp",
    "partition_date",
]
