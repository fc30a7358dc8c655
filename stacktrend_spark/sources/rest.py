"""REST source adapters (the reference's GitHub ingestion surface).

Re-expresses SURVEY §2.1 S6-S8 — paginated GitHub search
(github_data_ingestion.py:104-197, github_client.py:65-114), user-repo
pagination (personal_repos_ingestion.py:77-131), and per-repo activity
collection (personal_repos_ingestion.py:138-236) — as a pluggable,
testable source layer:

- **transport injection**: every adapter takes a
  ``transport(path, params) -> list|dict`` callable; production wires
  an HTTP client, tests wire deterministic fakes. No network code here.
- **rate limiting** stays in the adapter (the reference's 80 req/min
  self-cap, settings.py:43-44; page sleeps pri:110,171) via an
  injectable ``sleeper`` so tests run instantly.
- **JSON → DataFrame with an explicit schema** (SURVEY S4 "⟲ prefer
  explicit schema"): raw payloads are parsed against a declared nested
  StructType, then flattened with dotted-path projections
  (gdi:295-319 P1) into the canonical bronze schema — no inference.

Scale note: ingestion is driver-paginated exactly like the reference
(rate limits make the API the bottleneck, not Spark); the adapter
yields plain dicts so a distributed fetch (mapPartitions over a page
manifest) can replace the loop without touching the flatten/sink path.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stacktrend_spark.sources.search_gen import SearchQuery
from stacktrend_spark.pipelines.schemas import (
    BRONZE_ACTIVITY_SCHEMA,
    BRONZE_REPOS_SCHEMA,
)

Transport = Callable[[str, dict], object]

#: declared shape of a GitHub repository payload — the fields the
#: reference projects (gdi:295-322), nested structs included.
RAW_REPO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField(
            "owner",
            T.StructType(
                [
                    T.StructField("login", T.StringType()),
                    T.StructField("type", T.StringType()),
                ]
            ),
        ),
        T.StructField("description", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("pushed_at", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("stargazers_count", T.LongType()),
        T.StructField("watchers_count", T.LongType()),
        T.StructField("forks_count", T.LongType()),
        T.StructField("open_issues_count", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("default_branch", T.StringType()),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("license", T.StructType([T.StructField("name", T.StringType())])),
        T.StructField("has_wiki", T.BooleanType()),
        T.StructField("has_pages", T.BooleanType()),
        T.StructField("archived", T.BooleanType()),
        T.StructField("disabled", T.BooleanType()),
    ]
)

_ISO = "yyyy-MM-dd'T'HH:mm:ssX"


class RateLimiter:
    """The reference's self-cap: N requests/min (settings.py:43-44),
    fixed inter-request pacing (pri:110,171, github_client.py:53-63).
    ``sleeper`` injectable so tests don't wait."""

    def __init__(
        self,
        per_minute: int = 80,
        sleeper: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.min_interval = 60.0 / per_minute
        self.sleeper = sleeper
        self.clock = clock
        self._last = float("-inf")

    def wait(self) -> None:
        now = self.clock()
        delta = now - self._last
        if delta < self.min_interval:
            self.sleeper(self.min_interval - delta)
        self._last = self.clock()


def fetch_paginated(
    transport: Transport,
    path: str,
    params: dict,
    max_pages: int = 10,
    per_page: int = 100,
    items_key: str | None = None,
    limiter: RateLimiter | None = None,
    pages: Iterable[int] | None = None,
) -> list[dict]:
    """Generic pagination loop (gdi:169-197 / pri:91-131): request
    pages until an empty page or the page cap; optionally unwrap a
    search-style ``{"items": [...]}`` envelope. An explicit ``pages``
    set (gdi:170's random 3-of-5 sampling) overrides the sequential
    1..max_pages walk; empty pages are skipped, not terminal, since
    sampled pages aren't contiguous."""
    out: list[dict] = []
    if pages is not None:
        for page in pages:
            if limiter is not None:
                limiter.wait()
            payload = transport(path, {**params, "page": page, "per_page": per_page})
            items = payload[items_key] if items_key else payload
            out.extend(items or [])
        return out
    for page in range(1, max_pages + 1):
        if limiter is not None:
            limiter.wait()
        payload = transport(path, {**params, "page": page, "per_page": per_page})
        items = payload[items_key] if items_key else payload
        if not items:
            break
        out.extend(items)
        if len(items) < per_page:
            break
    return out


def repos_to_bronze(
    spark: SparkSession,
    raw_repos: Iterable[dict],
    partition_date: str,
    ingestion_ts: str,
    star_threshold: int = 0,
) -> DataFrame:
    """Raw GitHub repo payloads → canonical bronze DataFrame.

    Declared-schema JSON parse (S4 ⟲), nested flatten (P1: owner.login,
    license.name — gdi:295-319), distributed dedup on repository_id
    (replacing the driver-side seen-set, gdi:199-219 — SURVEY §2.4
    A12 ⟲), star-threshold filter (gdi:210).
    """
    json_rows = [json.dumps(r) for r in raw_repos]
    raw = spark.createDataFrame(json_rows, T.StringType()).select(
        F.from_json(F.col("value"), RAW_REPO_SCHEMA).alias("r")
    )
    flat = raw.select(
        F.col("r.id").alias("repository_id"),
        F.col("r.name").alias("name"),
        F.col("r.full_name").alias("full_name"),
        F.col("r.owner.login").alias("owner_login"),
        F.col("r.owner.type").alias("owner_type"),
        F.col("r.description").alias("description"),
        F.to_timestamp("r.created_at", _ISO).alias("created_at"),
        F.to_timestamp("r.updated_at", _ISO).alias("updated_at"),
        F.to_timestamp("r.pushed_at", _ISO).alias("pushed_at"),
        F.col("r.language").alias("language"),
        F.col("r.stargazers_count").alias("stargazers_count"),
        F.col("r.watchers_count").alias("watchers_count"),
        F.col("r.forks_count").alias("forks_count"),
        F.col("r.open_issues_count").alias("open_issues_count"),
        F.col("r.size").alias("size"),
        F.col("r.default_branch").alias("default_branch"),
        F.col("r.topics").alias("topics"),
        F.col("r.license.name").alias("license_name"),
        F.col("r.has_wiki").alias("has_wiki"),
        F.col("r.has_pages").alias("has_pages"),
        F.col("r.archived").alias("archived"),
        F.col("r.disabled").alias("disabled"),
        F.to_timestamp(F.lit(ingestion_ts)).alias("ingestion_timestamp"),
        F.lit(partition_date).alias("partition_date"),
    )
    # DETERMINISTIC survivor per repository_id (r8 review): plain
    # dropDuplicates keeps whichever duplicate a partition touches
    # first, so two runs over identical input could emit different
    # bronze rows when overlapping search queries return the same repo
    # with drifted counters. The min-payload-tuple rule is stable
    # across runs and engines. (The reference's driver-side seen-set
    # was first-wins in fetch order; fetch order doesn't survive the
    # distributed shuffle, so a content-based total order replaces it.)
    from pyspark.sql.window import Window as _W

    nonnull = flat.filter(F.col("repository_id").isNotNull())
    _payload = [c for c in nonnull.columns if c != "repository_id"]
    deduped = (
        nonnull.withColumn(
            "_rn",
            F.row_number().over(
                _W.partitionBy("repository_id").orderBy(
                    *[F.col(c).asc_nulls_first() for c in _payload]
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if star_threshold:
        deduped = deduped.filter(F.col("stargazers_count") > star_threshold)
    assert [f.name for f in BRONZE_REPOS_SCHEMA.fields] == deduped.columns
    return deduped


def search_repositories(
    spark: SparkSession,
    transport: Transport,
    queries: "Iterable[str | SearchQuery]",
    partition_date: str,
    ingestion_ts: str,
    star_threshold: int = 1000,
    max_pages: int = 10,
    per_page: int = 100,
    limiter: RateLimiter | None = None,
) -> DataFrame:
    """Trend-pipeline ingestion source (gdi:104-197): run each search
    query paginated, pool results, dedup + star-filter distributed.

    Entries may be plain query strings (stars-desc, first ``max_pages``
    pages) or ``search_gen.SearchQuery`` plans carrying their own
    sort/order and sampled page set (gdi:168-175)."""
    pooled: list[dict] = []
    for q in queries:
        if isinstance(q, str):
            params = {"q": q, "sort": "stars", "order": "desc"}
            pages: Iterable[int] | None = None
        else:
            params = {"q": q.query, "sort": q.sort, "order": q.order}
            pages = q.pages
        pooled.extend(
            fetch_paginated(
                transport,
                "/search/repositories",
                params,
                max_pages=max_pages,
                per_page=per_page,
                items_key="items",
                limiter=limiter,
                pages=pages,
            )
        )
    return repos_to_bronze(
        spark, pooled, partition_date, ingestion_ts, star_threshold=star_threshold
    )


def user_repositories(
    spark: SparkSession,
    transport: Transport,
    username: str,
    partition_date: str,
    ingestion_ts: str,
    limiter: RateLimiter | None = None,
) -> DataFrame:
    """Personal-pipeline repo source (pri:77-131): paginate
    /users/{u}/repos; no star filter (a portfolio keeps everything)."""
    raw = fetch_paginated(
        transport, f"/users/{username}/repos", {"type": "owner"}, limiter=limiter
    )
    return repos_to_bronze(spark, raw, partition_date, ingestion_ts)


def repo_activity(
    spark: SparkSession,
    transport: Transport,
    repos: DataFrame,
    partition_date: str,
    ingestion_ts: str,
    top_n: int = 20,
    limiter: RateLimiter | None = None,
) -> DataFrame:
    """Activity event source (pri:138-236): for the top-N
    most-recently-updated repos, fetch commits + issues and emit
    BRONZE_ACTIVITY_SCHEMA rows. Top-N selection is a Spark
    orderBy/limit (replacing the driver-side sorted()[:20],
    pri:219 — SURVEY §2.6 O4 ⟲)."""
    top = (
        repos.orderBy(F.desc("updated_at"), F.asc("repository_id"))
        .limit(top_n)
        .select("repository_id", "full_name")
        .collect()  # N<=20 identities — the API loop is driver-side anyway
    )
    rows: list[dict] = []
    for r in top:
        for kind, path in (
            ("commit", f"/repos/{r.full_name}/commits"),
            ("issue", f"/repos/{r.full_name}/issues"),
        ):
            for item in fetch_paginated(
                transport, path, {}, max_pages=1,
                per_page=50 if kind == "commit" else 30, limiter=limiter,
            ):
                # adapter contract: items carry the NORMALIZED flat
                # shape (id / author / date / ...) the injected
                # transport produces; a production GitHub client must
                # map the raw API payload first (sha -> id, the nested
                # author object -> author.login, commit.author.date ->
                # date) before handing items to this adapter (r8 note)
                rows.append(
                    {
                        "repository_id": r.repository_id,
                        "activity_type": kind,
                        "activity_id": str(item["id"]),
                        "author_login": item.get("author"),
                        "activity_date": item.get("date"),
                        "title": item.get("title"),
                        "additions": item.get("additions"),
                        "deletions": item.get("deletions"),
                        "changed_files": item.get("changed_files"),
                        "state": item.get("state"),
                        "ingestion_timestamp": ingestion_ts,
                        "partition_date": partition_date,
                    }
                )
    json_rows = [json.dumps(r) for r in rows]
    str_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType())
            if isinstance(f.dataType, T.TimestampType)
            else f
            for f in BRONZE_ACTIVITY_SCHEMA.fields
        ]
    )
    parsed = spark.createDataFrame(json_rows, T.StringType()).select(
        F.from_json("value", str_schema).alias("r")
    )
    return parsed.select(
        *[
            F.to_timestamp(f"r.{f.name}").alias(f.name)
            if isinstance(f.dataType, T.TimestampType)
            else F.col(f"r.{f.name}").alias(f.name)
            for f in BRONZE_ACTIVITY_SCHEMA.fields
        ]
    )


def fetch_distributed(
    requests_df: DataFrame,
    transport_factory: Callable[[], Transport],
    requests_per_minute: int = 80,
) -> DataFrame:
    """Executor-side fetch: the distributed replacement for the
    driver-paginated loop (the swap SCALE.md promises).

    ``requests_df`` is a manifest of (path, params_json) rows —
    typically one per page or per repo. Each partition builds its OWN
    transport via ``transport_factory`` (a picklable zero-arg callable:
    connections can't ship from the driver) and its own rate limiter,
    so a cluster of E executors sustains E × requests_per_minute
    against a sharded/proxied API. Rows stream through Arrow batches;
    the result keeps the manifest columns and appends the raw JSON
    payload for the standard parse path (``repos_to_bronze``).

    Use when the API allows parallel clients; the driver-side loop
    remains the default because one global rate budget (the
    reference's 80 req/min self-cap) is inherently serial.
    """
    import pandas as pd

    def run(batches):
        transport = transport_factory()
        limiter = RateLimiter(per_minute=requests_per_minute)
        for pdf in batches:
            payloads = []
            for path, params_json in zip(pdf["path"], pdf["params_json"]):
                limiter.wait()
                payloads.append(json.dumps(transport(path, json.loads(params_json))))
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "params_json": pdf["params_json"],
                    "payload_json": payloads,
                }
            )

    return requests_df.mapInPandas(
        run, "path string, params_json string, payload_json string"
    )
