"""Personal-portfolio pipeline: activity metrics + the three personal
gold tables (SURVEY §2.11 rows 8-10).

Semantics from personal_repos_bronze_to_silver.py:578-634 (per-period
activity metrics — the reference loops 7d/30d/90d on the driver and
unions; kept, it's 3 cheap plans) and personal_repos_silver_to_gold.py:
104-289 (portfolio overview, repo health dashboard, development
velocity), with the pinned ``as_of_date`` replacing datetime.now()
(SURVEY §4 anti-pattern 4) and the overview's driver-side collect()s
for top-technologies folded into the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

PERIODS = ("7d", "30d", "90d")


def activity_metrics(activity: DataFrame, as_of_date: str) -> DataFrame:
    """Per-(repository, period) activity rollup (prb2s:578-634): commit/
    issue/release count-ifs, coalesced line stats, commit frequency and
    the capped development-velocity blend."""
    as_of = F.lit(as_of_date).cast("timestamp")
    frames = []
    for period in PERIODS:
        days = int(period[:-1])
        cutoff = as_of - F.expr(f"INTERVAL {days} DAYS")
        frames.append(
            activity.filter(F.col("activity_date") >= cutoff)
            .groupBy("repository_id")
            .agg(
                F.sum(F.when(F.col("activity_type") == "commit", 1).otherwise(0)).alias(
                    "total_commits"
                ),
                F.sum(F.when(F.col("activity_type") == "issue", 1).otherwise(0)).alias(
                    "total_issues"
                ),
                F.sum(F.when(F.col("activity_type") == "release", 1).otherwise(0)).alias(
                    "total_releases"
                ),
                F.sum(F.coalesce(F.col("additions"), F.lit(0))).alias("lines_added"),
                F.sum(F.coalesce(F.col("deletions"), F.lit(0))).alias("lines_deleted"),
                F.sum(F.coalesce(F.col("changed_files"), F.lit(0))).alias("files_changed"),
                F.max("activity_date").alias("last_activity_date"),
            )
            .withColumn("measurement_period", F.lit(period))
            .withColumn(
                "commit_frequency",
                (F.col("total_commits") / F.lit(days)).cast("double"),
            )
            .withColumn(
                "development_velocity",
                F.least(
                    F.lit(1.0),
                    F.col("commit_frequency") * 0.4
                    + F.least(F.lit(1.0), F.col("lines_added") / 1000.0) * 0.3
                    + F.least(F.lit(1.0), F.col("files_changed") / 100.0) * 0.3,
                ).cast("double"),
            )
            .withColumn(
                "activity_trend",
                F.when(F.col("development_velocity") >= 0.7, "increasing")
                .when(F.col("development_velocity") >= 0.3, "stable")
                .otherwise("decreasing"),
            )
            .withColumn("partition_date", F.lit(as_of_date))
        )
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def portfolio_overview(silver: DataFrame, as_of_date: str, top_k: int = 5) -> DataFrame:
    """Gold: portfolio_overview (prs2g:104-149). The reference collects
    top technologies/languages to the driver and re-embeds them as
    array literals; we keep everything in-plan: top-k via window rank,
    folded back with collect_list over an ordered struct."""
    totals = silver.agg(
        F.count("repository_id").alias("total_repositories"),
        F.sum("stargazers_count").alias("total_stars"),
        F.sum("forks_count").alias("total_forks"),
        F.sum(F.when(F.col("is_active"), 1).otherwise(0)).alias("active_repositories"),
        F.avg("quality_score").alias("avg_quality_score"),
        F.countDistinct("technology_category").alias("n_categories"),
        F.countDistinct("primary_language").alias("n_languages"),
    )

    def top_list(col: str) -> DataFrame:
        w = W.orderBy(F.desc("count"), F.asc(col))
        return (
            silver.filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("count"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= top_k)
            .agg(F.sort_array(F.collect_list(F.struct("rnk", col))).alias("s"))
            .select(F.transform(F.col("s"), lambda x: x[col]).alias(f"top_{col}"))
        )

    tech = top_list("technology_category")
    lang = top_list("primary_language")
    # all three sides are 1-row aggregates: hint broadcast so the plan
    # stays a BroadcastNestedLoopJoin under AQE instead of a cartesian
    joined = totals.crossJoin(F.broadcast(tech)).crossJoin(F.broadcast(lang))
    active_ratio = F.col("active_repositories") / F.greatest(
        F.col("total_repositories"), F.lit(1)
    )
    return (
        joined.withColumn(
            "primary_technologies", F.col("top_technology_category")
        )
        .withColumn("primary_languages", F.col("top_primary_language"))
        .drop("top_technology_category", "top_primary_language")
        .withColumn(
            "portfolio_diversity_score",
            (
                F.col("n_categories") / F.greatest(F.col("total_repositories"), F.lit(1))
                + F.col("n_languages") / F.greatest(F.col("total_repositories"), F.lit(1))
            )
            / 2.0,
        )
        .withColumn(
            "activity_level",
            F.when(active_ratio >= 0.7, "high")
            .when(active_ratio >= 0.3, "medium")
            .otherwise("low"),
        )
        .withColumn("measurement_date", F.lit(as_of_date))
        .withColumn("partition_date", F.lit(as_of_date))
    )


def repo_health_dashboard(
    silver: DataFrame, activity_30d: DataFrame | None, as_of_date: str
) -> DataFrame:
    """Gold: repo_health_dashboard (prs2g:158-254): silver ⟕ 30d
    activity (J3) → weighted health score → grade → status →
    recommended actions."""
    if activity_30d is not None:
        act = activity_30d.filter(F.col("measurement_period") == "30d").select(
            "repository_id",
            "total_commits",
            "total_issues",
            "development_velocity",
            "last_activity_date",
        )
        df = silver.join(act, "repository_id", "left")
    else:
        df = (
            silver.withColumn("total_commits", F.lit(0))
            .withColumn("total_issues", F.lit(0))
            .withColumn("development_velocity", F.lit(0.0))
            .withColumn("last_activity_date", F.col("processed_timestamp"))
        )
    # the reference's health blend treats quality_score as 0-1; our
    # silver keeps it 0-100 (b2s scale), so it is normalized here
    health = F.least(
        F.lit(1.0),
        (
            (F.col("quality_score") / 100.0) * 0.4
            + F.coalesce(F.col("development_velocity"), F.lit(0.0)) * 0.3
            + F.when(F.col("is_active"), 0.3).otherwise(0.0)
        ).cast("double"),
    )
    scored = (
        df.withColumn("commits_30d", F.coalesce(F.col("total_commits"), F.lit(0)))
        .withColumn("issues_30d", F.coalesce(F.col("total_issues"), F.lit(0)))
        .withColumn("health_score", health)
        .withColumn(
            "health_grade",
            F.when(F.col("health_score") >= 0.8, "A")
            .when(F.col("health_score") >= 0.6, "B")
            .when(F.col("health_score") >= 0.4, "C")
            .when(F.col("health_score") >= 0.2, "D")
            .otherwise("F"),
        )
        .withColumn(
            "activity_status",
            F.when(F.col("days_since_push") <= 7, "active")
            .when(F.col("days_since_push") <= 30, "stable")
            .otherwise("dormant"),
        )
        .withColumn(
            "attention_needed",
            F.when(
                F.col("health_grade").isin("D", "F")
                | (F.col("activity_status") == "dormant")
                | (F.col("open_issues_count") > 10),
                True,
            ).otherwise(False),
        )
        .withColumn(
            "recommended_actions",
            F.when(
                F.col("activity_status") == "dormant",
                F.array(F.lit("review-purpose"), F.lit("archive-or-update")),
            )
            .when(
                F.col("open_issues_count") > 10,
                F.array(F.lit("address-issues"), F.lit("triage-backlog")),
            )
            .when(
                F.col("quality_score") < 50.0,
                F.array(F.lit("improve-documentation"), F.lit("add-license")),
            )
            .otherwise(F.array(F.lit("maintain-current-status"))),
        )
    )
    return scored.select(
        "repository_id",
        F.col("name").alias("repository_name"),
        "technology_category",
        "stargazers_count",
        "commits_30d",
        "issues_30d",
        F.coalesce(F.col("development_velocity"), F.lit(0.0)).alias(
            "development_velocity"
        ),
        "health_grade",
        "health_score",
        "activity_status",
        "attention_needed",
        "recommended_actions",
        F.lit(as_of_date).alias("measurement_date"),
        F.lit(as_of_date).alias("partition_date"),
    )


def development_velocity(activity_metrics_df: DataFrame, as_of_date: str) -> DataFrame:
    """Gold: development_velocity (prs2g:263-289): the 30d period slice
    with projections and trend labels."""
    m30 = activity_metrics_df.filter(F.col("measurement_period") == "30d")
    return m30.select(
        "repository_id",
        "total_commits",
        "total_issues",
        "total_releases",
        "lines_added",
        "lines_deleted",
        "files_changed",
        "commit_frequency",
        "development_velocity",
        "activity_trend",
        (F.col("commit_frequency") * 365).alias("projected_annual_commits"),
        F.lit(as_of_date).alias("measurement_date"),
        F.lit(as_of_date).alias("partition_date"),
    )
