"""Bronze → Silver transform (the reference's b2s notebook re-expressed
as a pure function).

Semantics from bronze_to_silver_transformation.py:686-853, with the
SURVEY §4 anti-patterns fixed:
- ``as_of_date`` is an explicit parameter (no current_date(): b2s:723-726);
- commit_frequency_30d is deterministic (b2s:756-758 used F.rand());
- classification labels apply via broadcast join, not dict-closure UDFs
  (b2s:533-575);
- the smart split computes the anti/inner join once, no repeated
  count() actions (b2s:477-494).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stacktrend_spark.functions.keywords import extract_keywords
from stacktrend_spark.functions.langdist import language_distribution
from stacktrend_spark.pipelines.classifier import Classifier, apply_classification
from stacktrend_spark.pipelines.schemas import SILVER_COLUMNS

#: smart-classification reuse threshold (b2s:464-468)
CONFIDENCE_THRESHOLD = 0.8


@dataclass
class SilverResult:
    silver: DataFrame
    quarantined: DataFrame  # rows dropped by quality gates (b2s:795-809)


def _clean(bronze: DataFrame, as_of_date: str) -> DataFrame:
    """Cleaning chain (b2s:686-734): regex sanitation, language
    normalization, topic standardization, license categorization,
    activity windows from the pinned as_of_date."""
    as_of = F.lit(as_of_date).cast("date")
    lic = F.col("license_name")
    # ONE withColumns projection instead of a 12-deep withColumn chain
    # (r13 optimization, guide §7.3 driver-side planning cost): each
    # withColumn adds a nested Project the analyzer re-walks at every
    # action embedding this lineage (both silver writes). Same column
    # append order and identical expressions — intra-chain references
    # (primary_language → language_distribution, description_clean /
    # topics_standardized → keywords, days_since_push → is_active) are
    # inlined as shared local expression objects; Catalyst common
    # subexpression elimination dedups them at codegen.
    desc_clean = F.when(
        F.col("description").isNotNull(),
        F.regexp_replace(F.col("description"), r"[^\w\s\-\.\,\:]", ""),
    ).otherwise(F.lit(None).cast("string"))
    primary = F.when(
        F.col("language").isNotNull(), F.lower(F.trim(F.col("language")))
    ).otherwise("unknown")
    topics_std = F.when(
        F.col("topics").isNotNull(),
        F.transform(F.col("topics"), lambda x: F.lower(F.trim(x))),
    ).otherwise(F.array().cast("array<string>"))
    days_push = F.datediff(as_of, F.col("pushed_at"))
    return bronze.withColumns(
        {
            "name_clean": F.regexp_replace(F.col("name"), r"[^\w\-\.]", ""),
            "description_clean": desc_clean,
            "primary_language": primary,
            "language_distribution": language_distribution(
                primary, F.col("topics")
            ),
            "topics_standardized": topics_std,
            "keywords": extract_keywords(desc_clean, topics_std),
            "license_category": F.when(
                lic.isNotNull(),
                F.when(lic.contains("MIT"), "permissive")
                .when(lic.contains("Apache"), "permissive")
                .when(lic.contains("GPL"), "copyleft")
                .when(lic.contains("BSD"), "permissive")
                .otherwise("other"),
            ).otherwise("none"),
            "days_since_push": days_push,
            "days_since_creation": F.datediff(as_of, F.col("created_at")),
            "is_active": days_push <= 90,
            "processed_timestamp": F.lit(as_of_date).cast("timestamp"),
            "partition_date": F.lit(as_of_date),
        }
    )


def _metrics(df: DataFrame) -> DataFrame:
    """Velocity/health/quality metrics (b2s:748-787). The reference's
    F.rand() commit-frequency placeholder is replaced by a
    deterministic id-derived stand-in (same 0-10 range) so goldens are
    stable; the personal pipeline computes the real value from the
    activity table (personal.py)."""
    stars = F.col("stargazers_count")
    has_description = F.col("description").isNotNull()
    has_license = F.col("license_name").isNotNull()
    has_topics = F.size(F.col("topics")) > 0
    reasonable_size = F.col("size") > 0
    # single withColumns projection (r13, same rationale as _clean):
    # every metric reads only pre-existing columns, so one Project is
    # expression-identical to the old 4-deep chain
    return df.withColumns(
        {
            "star_velocity_30d": F.when(
                F.col("days_since_creation") > 0,
                stars / F.greatest(F.col("days_since_creation"), F.lit(1)),
            ).otherwise(0.0),
            "commit_frequency_30d": F.when(
                F.col("is_active"),
                (F.col("repository_id") % 100).cast("double") / 10.0,
            ).otherwise(0.0),
            "community_health_score": (
                F.when(has_description, 20).otherwise(0)
                + F.when(has_license, 20).otherwise(0)
                + F.when(has_topics, 20).otherwise(0)
                + F.when(F.col("is_active"), 20).otherwise(0)
                + F.when(reasonable_size, 20).otherwise(0)
            ).cast("double"),
            "quality_score": (
                F.least(F.log10(F.greatest(stars, F.lit(1))) * 10, F.lit(50))
                + F.least(
                    F.log10(F.greatest(F.col("forks_count"), F.lit(1))) * 5,
                    F.lit(25),
                )
                + F.when(F.col("has_wiki"), 10).otherwise(0)
                + F.when(F.col("has_pages"), 10).otherwise(0)
                + F.least(F.size(F.col("topics")) * 2, F.lit(15))
            ).cast("double"),
        }
    )


def _validate(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Quality gates (b2s:795-809): flag, then quarantine
    missing-name / negative-star rows."""
    flagged = df.withColumn(
        "data_quality_flags",
        F.when(
            F.col("name").isNull() | (F.trim(F.col("name")) == ""),
            F.array(F.lit("missing_name")),
        )
        .when(F.col("stargazers_count") < 0, F.array(F.lit("negative_stars")))
        .when(F.col("community_health_score") < 0, F.array(F.lit("invalid_health_score")))
        .otherwise(F.array().cast("array<string>")),
    )
    bad = F.array_contains(F.col("data_quality_flags"), "missing_name") | (
        F.col("stargazers_count") < 0
    )
    return flagged.filter(~bad), flagged.filter(bad)


def smart_split(
    bronze: DataFrame, existing_silver: DataFrame | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The 90%-cost-saving split (b2s:461-494): rows whose existing
    classification is confident (category != Other, subcategory !=
    unknown, confidence >= 0.8) skip the classifier and only refresh
    metrics; the rest go to the classifier. Returns
    (needs_classification, metrics_only, reusable_labels)."""
    if existing_silver is None:
        empty = bronze.sparkSession.createDataFrame(
            [], "repository_id long, technology_category string, "
            "technology_subcategory string, classification_confidence double"
        )
        return bronze, bronze.limit(0), empty
    well_classified = existing_silver.filter(
        (F.col("technology_category") != "Other")
        & (F.col("technology_subcategory") != "unknown")
        & (F.col("classification_confidence") >= CONFIDENCE_THRESHOLD)
    ).select(
        "repository_id",
        "technology_category",
        "technology_subcategory",
        "classification_confidence",
    )
    needs = bronze.join(well_classified, "repository_id", "left_anti")
    metrics_only = bronze.join(
        well_classified.select("repository_id"), "repository_id", "left_semi"
    )
    return needs, metrics_only, well_classified


def build_silver(
    bronze: DataFrame,
    classifier: Classifier,
    as_of_date: str,
    existing_silver: DataFrame | None = None,
) -> SilverResult:
    """Full bronze→silver: clean → smart split → classify the needed
    subset → broadcast-apply labels → union → metrics → quality gates →
    the 29-column silver projection (b2s:822-853)."""
    needs, metrics_only, reusable = smart_split(bronze, existing_silver)
    fresh_labels = classifier.classify(needs)
    labels = fresh_labels.unionByName(reusable)
    labeled = apply_classification(bronze, labels)
    cleaned = _metrics(_clean(labeled, as_of_date))
    good, bad = _validate(cleaned)
    return SilverResult(silver=good.select(*SILVER_COLUMNS), quarantined=bad)


def observe_quality(df: DataFrame, name: str = "silver_quality"):
    """Attach lazy data-quality counters to a plan (SURVEY §4
    anti-pattern 1: the reference re-runs `.count()` three times before
    classification, b2s:477-494 — each re-triggering full lineage).

    ``Observation`` metrics ride along with whatever action
    materializes ``df`` (typically the sink write): zero extra jobs,
    zero extra scans. Returns (observed_df, observation); read
    ``observation.get`` AFTER an action has run.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.size("data_quality_flags") > 0).cast("long")
        ).alias("n_flagged"),
    )
    return observed, obs
