"""File-format source coverage: CSV, JSON-lines, and ORC readers.

The reference ingests REST JSON and persists Delta/parquet only
(SURVEY §2.1); a drop-in engine must also read the interchange formats
a lake actually accumulates. This query round-trips three dimension
tables through three formats — nation → CSV (header + quoted comment
fields), region → JSON lines, supplier → ORC — then reads each back
with a DECLARED schema and joins them.

100 TB notes: schemas are declared, never inferred — schema inference
is a full extra pass over the data. The CSV/JSON readers here are
per-file splittable the same as parquet scans; the join puts the two
tiny dims on the broadcast side so the supplier scan is the only
distributed input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.plans.registry import register
from stacktrend_spark.functions.fsutil import tmpdir as _tmpdir
from stacktrend_spark.sources.tables import load_table





@register(
    "source_format_roundtrip",
    oracle="""
        SELECT
            r.r_name                          AS region_name,
            CAST(COUNT(*) AS BIGINT)          AS n_suppliers,
            CAST(SUM(s.s_suppkey) AS BIGINT)  AS sum_suppkey
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
    """,
    doc=(
        "CSV/JSONL/ORC reader round-trip: three dims written to three "
        "formats, read back with declared schemas, joined and rolled up."
    ),
)
def source_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier")

    # per-invocation dir: a fixed path lets concurrent harness processes
    # overwrite each other's files mid-read
    base = _tmpdir(prefix="stacktrend_formats_")
    csv_path = f"{base}/nation_csv"
    json_path = f"{base}/region_json"
    orc_path = f"{base}/supplier_orc"

    nation.write.mode("overwrite").option("header", True).csv(csv_path)
    region.write.mode("overwrite").json(json_path)
    supplier.write.mode("overwrite").orc(orc_path)

    n = spark.read.schema(nation.schema).option("header", True).csv(csv_path)
    r = spark.read.schema(region.schema).json(json_path)
    s = spark.read.orc(orc_path)

    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("s_suppkey").cast("long").alias("sum_suppkey"),
        )
    )


@register(
    "source_binary_files",
    # the oracle never touches the files: it recomputes length/digest
    # from the SAME document rows the writer serialized, so a pass
    # proves the binaryFile source read back exactly what was written
    # (octet_length on the UTF-8 encoding mirrors Spark's byte length)
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text)                                  AS digest
        FROM documents WHERE doc_id < 20
    """,
    doc="binaryFile source: opaque-bytes ingestion round-trip with length+digest parity.",
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingestion front door: raw files → (path, bytes) rows
    via Spark's `binaryFile` source, the step that feeds
    operators/multimodal.py's decode UDFs in a real pipeline.

    The write side materializes 20 documents as .bin files (bounded
    driver loop — mirrors the N≤20 pattern documented in
    sources/rest.py; at scale files land via the object store, not the
    driver). The read side is the scalable half being exercised:
    binaryFile lists and reads files distributed, one task per file
    group, content as an opaque binary column.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .collect()  # bounded: 20 rows, write-side fixture only
    )
    base = _tmpdir(prefix="stacktrend_binfiles_")
    if not docs:
        # r13 empty-corpus fix: the glob load raises PATH_NOT_FOUND
        # when zero fixture files exist; an empty corpus reads as the
        # empty result.
        return spark.createDataFrame(
            [], "doc_id long, n_bytes long, digest string"
        )
    for row in docs:
        with open(os.path.join(base, f"{row.doc_id}.bin"), "wb") as fh:
            fh.write(row.text.encode("utf-8"))
    df = spark.read.format("binaryFile").load(f"{base}/*.bin")
    return df.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )


@register(
    "source_schema_evolution",
    # the oracle recomputes the merged read closed-form over orders:
    # even keys were written WITHOUT o_totalprice (v1 schema) so their
    # merged value is NULL; odd keys carry it. Cents are exact ints.
    oracle="""
        SELECT
            CAST(o_orderkey % 2 AS BIGINT)   AS writer_version,
            CAST(COUNT(*) AS BIGINT)         AS n_rows,
            CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
                                             AS n_with_price,
            CAST(COALESCE(SUM(CASE WHEN o_orderkey % 2 = 1
                     THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                 END), 0) AS BIGINT)         AS sum_price_cents
        FROM orders
        GROUP BY 1
    """,
    doc=(
        "Schema-evolution read: two parquet writer generations (v1 "
        "lacks o_totalprice), one mergeSchema scan; missing column "
        "nulls verified closed-form. Schema merge is footer-only — no "
        "data pass."
    ),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = _tmpdir(prefix="stacktrend_evo_")
    v1 = f"{base}/gen=1"
    v2 = f"{base}/gen=2"
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey"
    ).write.mode("overwrite").parquet(v1)
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.mode("overwrite").parquet(v2)

    merged = spark.read.option("mergeSchema", True).parquet(v1, v2)
    return merged.groupBy(
        (F.col("o_orderkey") % 2).cast("long").alias("writer_version")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("o_totalprice").cast("long").alias("n_with_price"),
        F.coalesce(
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_price_cents"),
    )


@register(
    "source_xml_roundtrip",
    oracle="""
        SELECT r.r_regionkey                    AS region_key,
               CAST(COUNT(*) AS BIGINT)         AS n_nations,
               CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_nationkey
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
    """,
    doc=(
        "Native XML round-trip (Spark 4 built-in xml source): nation "
        "written as row-tagged XML, read back with a DECLARED schema, "
        "joined to region. (Avro is NOT bundled in this environment — "
        "format('avro') raises FAILED_TO_FIND_DATA_SOURCE — so XML is "
        "the fourth interchange format after CSV/JSONL/ORC.)"
    ),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = _tmpdir(prefix="stacktrend_xml_")
    path = f"{base}/nation_xml"
    nation.write.format("xml").option("rowTag", "nation").save(path)
    n = (
        spark.read.format("xml")
        .schema(nation.schema)
        .option("rowTag", "nation")
        .load(path)
    )
    return (
        n.join(F.broadcast(region), n.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_regionkey").alias("region_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("sum_nationkey"),
        )
    )


@register(
    "source_compression_roundtrip",
    # identical aggregate per codec proves each roundtrip is lossless;
    # codec byte sizes are env-dependent so they stay OUT of the
    # hashed surface (logged via bench/input stats instead)
    oracle="""
        WITH agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                        AS BIGINT)          AS sum_cents
            FROM orders
        )
        SELECT codec, n_rows, sum_cents
        FROM agg, (VALUES ('snappy'), ('zstd'), ('gzip')) AS c(codec)
        ORDER BY codec
    """,
    doc=(
        "Compression-codec round-trip: orders written as parquet under "
        "snappy/zstd/gzip, each read back and aggregated — identical "
        "values per codec prove lossless storage; sizes are "
        "env-dependent and excluded from the hashed surface."
    ),
)
def source_compression_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = _tmpdir(prefix="stacktrend_codec_")
    out = None
    for codec in ("gzip", "snappy", "zstd"):
        path = f"{base}/{codec}"
        orders.write.option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        agg = back.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("sum_cents"),
        ).select(F.lit(codec).alias("codec"), "n_rows", "sum_cents")
        out = agg if out is None else out.unionAll(agg)
    return out


# ---------------------------------------------------------------------------
# Corrupt-record routing (r7) — the ingest-quarantine surface every
# production JSON feed needs: PERMISSIVE parsing with a
# _corrupt_record column routes malformed lines into a quarantine
# stream instead of failing the job (or silently dropping rows, as
# DROPMALFORMED would). Corruption is synthesized deterministically
# (every 7th document's JSON line loses its closing brace), so the
# oracle predicts the routing closed-form from the parquet table.
# 100 TB: parsing is map-side (schema declared, no inference pass);
# the rollup is one aggregate. Quarantined rows keep their raw bytes —
# the replayable dead-letter contract.
# ---------------------------------------------------------------------------
@register(
    "source_corrupt_record_routing",
    oracle="""
        SELECT
            CAST(COUNT(*) AS BIGINT)                             AS n_total,
            CAST(COUNT(CASE WHEN doc_id % 7 <> 0 THEN 1 END)
                 AS BIGINT)                                      AS n_valid,
            CAST(COUNT(CASE WHEN doc_id % 7 = 0 THEN 1 END)
                 AS BIGINT)                                      AS n_quarantined,
            CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN doc_id END)
                 AS BIGINT)                                      AS sum_valid_ids,
            CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN n_chars END)
                 AS BIGINT)                                      AS sum_valid_chars
        FROM documents
    """,
    doc=(
        "PERMISSIVE JSON ingest with _corrupt_record quarantine "
        "routing: every 7th line deterministically malformed; valid "
        "rows parse against the declared schema, corrupt rows keep "
        "raw bytes for replay; closed-form oracle."
    ),
)
def source_corrupt_record_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source"
    )
    # build the raw JSONL feed: valid lines via to_json, every 7th
    # line truncated (closing brace dropped) -> guaranteed malformed
    line = F.to_json(F.struct("doc_id", "n_chars", "source"))
    raw = docs.withColumn("l", line).select(
        F.when(
            F.col("doc_id") % 7 == 0, F.expr("substring(l, 1, length(l) - 1)")
        )
        .otherwise(F.col("l"))
        .alias("value")
    )
    base = _tmpdir(prefix="stacktrend_corrupt_")
    path = f"{base}/feed_jsonl"
    raw.write.mode("overwrite").text(path)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("source", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    is_bad = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count(F.when(~is_bad, 1)).cast("long").alias("n_valid"),
        F.count(F.when(is_bad, 1)).cast("long").alias("n_quarantined"),
        F.sum(F.when(~is_bad, F.col("doc_id"))).cast("long").alias("sum_valid_ids"),
        F.sum(F.when(~is_bad, F.col("n_chars")))
        .cast("long")
        .alias("sum_valid_chars"),
    )


# ---------------------------------------------------------------------------
# Python Data Source API (r7) — Spark 4's pyspark.sql.datasource:
# a PYTHON-DEFINED table-valued source whose partitions generate rows
# on executors (sources/pyfeed.py). The reference collects REST pages
# on the driver (github_api_client.py); this is the native
# partition-parallel form. The feed is deterministic md5 arithmetic,
# so the oracle rebuilds all 10k rows closed-form with generate_series
# + the engine-neutral hex40 — the gate value-checks a Python-defined
# source end to end.
# 100 TB: ingestion parallelism = len(partitions()), each reading its
# own range/page window executor-side; nothing flows through the
# driver. Registration is idempotent per session.
# ---------------------------------------------------------------------------
from stacktrend_spark.functions.hashing import sql_hex40  # noqa: E402


@register(
    "source_python_datasource",
    oracle=f"""
        WITH feed AS (
            SELECT i AS event_id,
                   (['push', 'fork', 'star', 'issue', 'release'])
                       [({sql_hex40("'feed|' || CAST(i AS VARCHAR)")}) % 5 + 1]
                       AS kind,
                   (({sql_hex40("'feed|' || CAST(i AS VARCHAR)")}) // 7) % 100000
                       AS score_cents
            FROM (SELECT unnest(generate_series(0, 9999)) AS i)
        )
        SELECT kind,
               CAST(COUNT(*) AS BIGINT)          AS n_events,
               CAST(SUM(score_cents) AS BIGINT)  AS sum_score_cents,
               CAST(MIN(event_id) AS BIGINT)     AS first_event_id,
               CAST(MAX(event_id) AS BIGINT)     AS last_event_id
        FROM feed GROUP BY kind
    """,
    doc=(
        "Python Data Source API: a python-defined partition-parallel "
        "feed (8 executor-side generators, 10k deterministic md5 "
        "rows), rolled up per kind — the source itself is "
        "value-checked against a closed-form oracle."
    ),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.sources.pyfeed import SyntheticFeedDataSource

    try:
        spark.dataSource.register(SyntheticFeedDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    feed = spark.read.format("synthetic_feed").load()
    return feed.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("score_cents").cast("long").alias("sum_score_cents"),
        F.min("event_id").cast("long").alias("first_event_id"),
        F.max("event_id").cast("long").alias("last_event_id"),
    )


# ---------------------------------------------------------------------------
# Observation API + noop sink (r7) — production pipelines attach
# df.observe() metrics to passes they were running ANYWAY (row counts,
# null rates, sums for reconciliation) and read them from the query
# listener at zero extra scan cost; the noop sink is the benchmark/
# audit sink that executes a full pass with no output. This query runs
# ONE observed pass over lineitem into noop and returns the collected
# metrics as the result frame — the oracle recomputes them from SQL,
# so the gate value-checks Spark's observed-metrics channel itself.
# 100 TB: the metrics ride an existing action (here: the noop write);
# no second scan, no collect of data rows — only the aggregated
# observation comes back to the driver.
# ---------------------------------------------------------------------------
@register(
    "observed_metrics_noop_sink",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT)                    AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT)                             AS n_returns,
               CAST(SUM(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END)
                    AS BIGINT)                             AS n_high_qty
        FROM lineitem
    """,
    doc=(
        "df.observe() metrics riding a noop-sink pass over lineitem "
        "(row count, quantity sum, return count, high-quantity count) "
        "returned as the result frame — value-checks the "
        "observed-metrics channel end to end."
    ),
)
def observed_metrics_noop_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag"
    )
    obs = Observation("lineitem_pass")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returns"
        ),
        F.sum(F.when(F.col("l_quantity") >= 45, 1).otherwise(0)).alias(
            "n_high_qty"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get

    # r13 empty-corpus fix: SUM over zero rows observes as None and
    # int(None) raised on the driver — pass the NULL through (the
    # oracle's SUM over an empty table is NULL too)
    def as_long(v):
        return int(v) if v is not None else None

    return spark.createDataFrame(
        [
            (
                as_long(m["n_rows"]),
                as_long(m["sum_qty"]),
                as_long(m["n_returns"]),
                as_long(m["n_high_qty"]),
            )
        ],
        "n_rows long, sum_qty long, n_returns long, n_high_qty long",
    )
