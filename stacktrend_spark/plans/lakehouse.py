"""Lakehouse maintenance queries: CDC apply, SCD Type 2, data-quality
audit.

The reference maintains its tables with Delta MERGE upserts
(github_data_ingestion.py:355-383, bronze_to_silver.py:873-918 — see
operators/merge.py for the oracle-checked MERGE shapes). These queries
cover the surrounding lifecycle a lakehouse actually runs: applying a
change-data feed to reconstruct current state, keeping full
slowly-changing-dimension history, and auditing table invariants
before publishing a layer.

Cross-engine discipline: every hashed surface is integers, strings,
booleans, or epoch-µs longs — no floats anywhere in this module.

Scale notes (100 TB):
- ``cdc_latest_state`` is one hash shuffle on the key + a window; at
  scale the same plan runs per partition-pruned date bucket. Latest-
  wins is resolved with (ts, event_id) so replays are idempotent.
- ``scd2_event_type_history`` is two window passes over ONE sort of
  the same (user) partitioning — Catalyst reuses the exchange; no
  second shuffle.
- ``data_quality_audit`` unions independent single-pass checks; each
  foreign-key probe broadcasts the dimension key column (dims are
  orders-of-magnitude smaller than facts), so no check adds a fact-
  sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import iscale, sql_iscale
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

# CDC op classification: the events stream is read as a change feed on
# the user entity — signup opens it, activity updates it, error closes
# it (same classification on both engines).
_SQL_OP = """
    CASE event_type WHEN 'signup' THEN 'I'
                    WHEN 'error'  THEN 'D'
                    ELSE 'U' END
"""


def _op(col: F.Column) -> F.Column:
    return (
        F.when(col == "signup", "I").when(col == "error", "D").otherwise("U")
    )


@register(
    "cdc_latest_state",
    oracle=f"""
        WITH feed AS (
            SELECT user_id,
                   {_SQL_OP} AS op,
                   epoch_us(ts) AS ts_us,
                   {sql_iscale("value")} AS value_cents,
                   event_id
            FROM events
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts_us DESC, event_id DESC) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
            FROM feed
        )
        SELECT user_id, op AS last_op, ts_us AS last_ts_us,
               value_cents AS last_value_cents, n_changes
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="CDC apply: last-writer-wins snapshot of a change feed, delete-aware.",
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct current entity state from an I/U/D change feed.

    One shuffle on the entity key; the (ts, event_id) ordering makes
    replayed/duplicated feed batches converge to the same snapshot
    (idempotent apply — the property Delta MERGE gives the reference's
    ingestion at github_data_ingestion.py:355-383).
    """
    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        "user_id",
        _op(F.col("event_type")).alias("op"),
        F.unix_micros("ts").alias("ts_us"),
        iscale("value").alias("value_cents"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(W.partitionBy("user_id")))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("ts_us").alias("last_ts_us"),
            F.col("value_cents").alias("last_value_cents"),
            "n_changes",
        )
    )


@register(
    "scd2_event_type_history",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type, ts_us
            FROM seq
            WHERE prev_type IS NULL OR event_type <> prev_type
        )
        SELECT user_id, event_type,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us)
                    AS BIGINT)                                   AS version,
               ts_us                                             AS valid_from_us,
               LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                                                                 AS valid_to_us,
               LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                                                                 AS is_current
        FROM changes
    """,
    doc="SCD Type 2: collapse a change feed into validity intervals with version numbers.",
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension history table from a change feed.

    Consecutive identical attribute values collapse into one interval
    (true change capture); `valid_to` chains to the next version's
    `valid_from`, open-ended for the current row. Both window passes
    partition by user — one exchange, reused.
    """
    ev = load_table(spark, sf_dir, "events")
    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.lag("event_type").over(order_w).alias("prev_type"),
    )
    changes = seq.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    ver_w = W.partitionBy("user_id").orderBy("ts_us")
    return changes.select(
        "user_id",
        "event_type",
        F.row_number().over(ver_w).cast("long").alias("version"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(ver_w).alias("valid_to_us"),
        F.lead("ts_us").over(ver_w).isNull().alias("is_current"),
    )


#: (check_name, fact table, SQL fragment pair) — each check is a
#: single pass over its fact table; FK probes LEFT JOIN a broadcast
#: dimension key column.
_SQL_AUDIT = f"""
    SELECT 'orders.custkey_fk' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT)
               AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.orderkey_fk',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'events.user_id_not_null',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events.value_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN {sql_iscale("value")} < 0
                            OR {sql_iscale("value")} > 100000000 THEN 1 END)
                AS BIGINT)
    FROM events WHERE value IS NOT NULL
    UNION ALL
    SELECT 'documents.text_nonempty',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 1 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'documents.doc_id_unique',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'orders.status_domain',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
                AS BIGINT)
    FROM orders
"""


@register(
    "data_quality_audit",
    oracle=_SQL_AUDIT,
    doc="Expectations audit: FK orphans, null/domain/range/uniqueness checks, one row per check.",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-publish table audit: each invariant is one aggregate pass.

    The two FK probes broadcast only the dimension's key column (at
    100 TB the dim key set is GBs against a fact table of TBs — still
    broadcastable; if not, the same plan degrades to a shuffle join on
    the key). No check materializes violating ROWS — counts only; a
    debugging variant would add a `.filter` + limit per check.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame, viol: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.count(F.when(viol, 1)).alias("n_violations"),
        )

    cents = iscale("value")
    checks = [
        check(
            "orders.custkey_fk",
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
                "left",
            ),
            F.col("c_custkey").isNull(),
        ),
        check(
            "lineitem.orderkey_fk",
            lineitem.join(
                F.broadcast(orders.select("o_orderkey")),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left",
            ),
            F.col("o_orderkey").isNull(),
        ),
        check("events.user_id_not_null", events, F.col("user_id").isNull()),
        check(
            "events.value_range",
            events.filter(F.col("value").isNotNull()),
            (cents < 0) | (cents > 100_000_000),
        ),
        check(
            "documents.text_nonempty",
            documents,
            F.length(F.trim(F.col("text"))) == 0,
        ),
        documents.agg(
            F.lit("documents.doc_id_unique").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("n_violations"),
        ),
        check(
            "orders.status_domain",
            orders,
            ~F.col("o_orderstatus").isin("O", "F", "P"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


@register(
    "table_fingerprint_buckets",
    # canonical row string is integer-only (key + exact cents), md5'd,
    # first 10 hex chars (40 bits) parsed as int64 and SUMMED per bucket
    # (2^40 x 10^8 rows/bucket stays well under int64, so the checked
    # casts of both engines never trip) — sums
    # of ints are order-independent, so the fingerprint is stable under
    # any partitioning/scan order in any engine.
    # r5 (ADVICE): hex→int in the oracle is a per-nibble STRPOS fold
    # (the corpus_shard_assign idiom, ANSI-portable) instead of the
    # DuckDB-version-dependent '0x…' VARCHAR→BIGINT cast extension.
    oracle=f"""
        WITH rows_c AS (
            SELECT o_orderkey % 16 AS bucket,
                   SUBSTR(md5(
                       CAST(o_orderkey AS VARCHAR) || ':' ||
                       CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS VARCHAR)), 1, 10) AS hx
            FROM orders
        ),
        parsed AS (
            SELECT bucket,
                   {" + ".join(
                       f"(STRPOS('0123456789abcdef', SUBSTR(hx, {i + 1}, 1)) - 1)"
                       f" * CAST({16 ** (9 - i)} AS BIGINT)"
                       for i in range(10)
                   )} AS h
            FROM rows_c
        )
        SELECT CAST(bucket AS BIGINT)  AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(h) AS BIGINT)   AS fingerprint
        FROM parsed GROUP BY 1
    """,
    doc=(
        "Anti-entropy bucket fingerprints: order-independent md5-sum "
        "per key bucket — two replicas (or a source and its CDC "
        "mirror) compare 16 rows instead of re-reading two tables; "
        "mismatched buckets localize the diff for repair."
    ),
)
def table_fingerprint_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    canon = F.concat(
        F.col("o_orderkey").cast("string"), F.lit(":"), cents.cast("string")
    )
    h = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 10), 16, 10).cast(
        "long"
    )
    return (
        orders.select(
            (F.col("o_orderkey") % 16).cast("long").alias("bucket"),
            h.alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h").cast("long").alias("fingerprint"),
        )
    )


@register(
    "compliance_delete_audit",
    # the pre-deletion impact report of a GDPR/right-to-be-forgotten
    # sweep: one driver query, one row per affected table
    oracle="""
        WITH del AS (
            SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
        )
        SELECT 'customer' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows_affected,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM del
        UNION ALL
        SELECT 'orders',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
        FROM orders o JOIN del d ON o.o_custkey = d.c_custkey
        UNION ALL
        SELECT 'lineitem',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN del d ON o.o_custkey = d.c_custkey
    """,
    doc=(
        "Right-to-be-forgotten impact audit: a deletion key set "
        "(broadcast) semi-joined through the FK chain customer -> "
        "orders -> lineitem; per-table affected-row counts BEFORE any "
        "destructive delete runs."
    ),
)
def compliance_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_keys = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    o_hit = orders.join(
        F.broadcast(del_keys), orders.o_custkey == del_keys.c_custkey
    )
    li_hit = li.join(
        F.broadcast(o_hit.select("o_orderkey", "o_custkey")),
        li.l_orderkey == F.col("o_orderkey"),
    )
    a = del_keys.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_affected"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    ).select(F.lit("customer").alias("table_name"), "n_rows_affected", "n_keys")
    b = o_hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_affected"),
        F.count_distinct(F.col("o_custkey")).cast("long").alias("n_keys"),
    ).select(F.lit("orders").alias("table_name"), "n_rows_affected", "n_keys")
    c = li_hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_affected"),
        F.count_distinct(F.col("o_custkey")).cast("long").alias("n_keys"),
    ).select(F.lit("lineitem").alias("table_name"), "n_rows_affected", "n_keys")
    return a.unionAll(b).unionAll(c)


@register(
    "incremental_agg_maintenance",
    # algebraic-aggregate maintenance proof: agg(full) must equal
    # merge(agg(base), agg(delta)) for every key — the property that
    # makes incremental materialized views trustworthy. The query
    # OUTPUTS the comparison, so the driver hash-checks the proof.
    oracle="""
        WITH base AS (SELECT * FROM events WHERE event_id % 10 <> 0),
        delta AS (SELECT * FROM events WHERE event_id % 10 = 0),
        merged AS (
            SELECT user_id,
                   SUM(n) AS n_events,
                   SUM(s) AS sum_cents,
                   MAX(mx) AS max_cents
            FROM (
                SELECT user_id, COUNT(*) AS n,
                       SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS s,
                       MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS mx
                FROM base GROUP BY 1
                UNION ALL
                SELECT user_id, COUNT(*),
                       SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)),
                       MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                FROM delta GROUP BY 1
            ) parts GROUP BY 1
        ),
        full_agg AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   CAST(MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS max_cents
            FROM events GROUP BY 1
        )
        SELECT f.user_id,
               f.n_events,
               f.sum_cents,
               f.max_cents,
               CAST(m.n_events AS BIGINT) = f.n_events
                 AND CAST(m.sum_cents AS BIGINT) = f.sum_cents
                 AND CAST(m.max_cents AS BIGINT) = f.max_cents AS consistent
        FROM full_agg f JOIN merged m USING (user_id)
    """,
    doc=(
        "Incremental-view maintenance proof: per-user totals computed "
        "full vs merge(agg(base), agg(delta)) — the algebraic-merge "
        "property that lets a 100 TB materialized view update from the "
        "delta alone; the equality is part of the hashed output."
    ),
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    ev = ev.select("event_id", "user_id", cents.alias("cents"))

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.max("cents").alias("mx"),
        )

    base = agg(ev.filter(F.col("event_id") % 10 != 0))
    delta = agg(ev.filter(F.col("event_id") % 10 == 0))
    merged = (
        base.unionAll(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("m_n"),
            F.sum("s").alias("m_s"),
            F.max("mx").alias("m_mx"),
        )
    )
    full = agg(ev).select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("s").cast("long").alias("sum_cents"),
        F.col("mx").cast("long").alias("max_cents"),
    )
    return full.join(merged, "user_id").select(
        "user_id",
        "n_events",
        "sum_cents",
        "max_cents",
        (
            (F.col("m_n").cast("long") == F.col("n_events"))
            & (F.col("m_s").cast("long") == F.col("sum_cents"))
            & (F.col("m_mx").cast("long") == F.col("max_cents"))
        ).alias("consistent"),
    )


# ---------------------------------------------------------------------------
# Compaction planning — the small-files problem. A streaming ingest
# leaves thousands of KB-scale files per partition; the maintenance job
# plans target-sized compaction bins BEFORE rewriting anything. The
# planner here is volume-ordered next-fit: files ordered largest-first
# (with a unique tiebreak), bin = cumulative-bytes-before DIV target —
# deterministic, one pass, and expressible identically in any engine.
# The running sum uses the two-phase scalable operator
# (operators/ranking.global_running_sum_scalable) — the file CATALOG at
# 100 TB is millions of rows, and a single-partition window over it is
# the exact anti-pattern this repo bans. Beyond-reference addition
# (lakehouse-ops family).
# ---------------------------------------------------------------------------

_COMPACT_TARGET_BYTES = 64 * 1024


@register(
    "compaction_bin_packing",
    oracle=f"""
        WITH files AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(LENGTH(props) + 32) AS BIGINT) AS est_bytes
            FROM events GROUP BY 1, 2
        ),
        planned AS (
            SELECT event_type, day, n_rows, est_bytes,
                   CAST(COALESCE(SUM(est_bytes) OVER (
                       ORDER BY est_bytes DESC, event_type, day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS before_bytes
            FROM files
        )
        SELECT CAST(before_bytes // {_COMPACT_TARGET_BYTES} AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT)      AS n_files,
               CAST(SUM(n_rows) AS BIGINT)   AS n_rows,
               CAST(SUM(est_bytes) AS BIGINT) AS total_bytes
        FROM planned GROUP BY 1
    """,
    doc=(
        f"Compaction planner: (event_type, day) micro-files packed into "
        f"~{_COMPACT_TARGET_BYTES}-byte bins by largest-first next-fit "
        "over a two-phase scalable running sum — no single-partition "
        "window over the file catalog."
    ),
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.operators.ranking import global_running_sum_scalable

    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.length("props") + F.lit(32)).cast("long").alias("est_bytes"),
    )
    summed = global_running_sum_scalable(
        files,
        order_cols=[F.desc("est_bytes"), F.asc("event_type"), F.asc("day")],
        value_col="est_bytes",
        sum_col="thru_bytes",
    )
    return (
        summed.withColumn(
            "bin_id",
            F.expr(f"(thru_bytes - est_bytes) DIV {_COMPACT_TARGET_BYTES}"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("est_bytes").cast("long").alias("total_bytes"),
        )
        .select(F.col("bin_id").cast("long"), "n_files", "n_rows", "total_bytes")
    )


# ---------------------------------------------------------------------------
# Anti-entropy table diff — the drill-down half of
# table_fingerprint_buckets. Version B is a deterministic mutation of
# orders (both engines derive it identically): keys %500==0 reprice
# (+1.00), keys %997==0 deleted, keys %1009==0 re-inserted shifted
# past the keyspace. The repair protocol: (1) compare 64 per-bucket
# order-independent fingerprints — O(1) rows move; (2) ONLY for
# mismatched buckets, join row digests by key to count insert/delete/
# update repairs. At 100 TB step 2's join is pre-filtered by the
# bucket list (broadcast semi-join), so repair cost scales with the
# DIFF, not the table. Beyond-reference addition (lakehouse-ops).
# ---------------------------------------------------------------------------


def _sql_row_digest(alias: str) -> str:
    hx = (
        f"SUBSTR(md5(CAST({alias}.o_orderkey AS VARCHAR) || ':' || "
        f"CAST(CAST(FLOOR({alias}.o_totalprice * 100.0 + 0.5) AS BIGINT)"
        " AS VARCHAR)), 1, 10)"
    )
    return " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({hx}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (9 - i)} AS BIGINT)"
        for i in range(10)
    )


@register(
    "table_diff_by_fingerprint",
    oracle=f"""
        WITH a AS (
            SELECT o_orderkey, o_totalprice FROM orders
        ),
        b AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 500 = 0 THEN o_totalprice + 1.00
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 997 <> 0
            UNION ALL
            SELECT o_orderkey + 100000000, o_totalprice
            FROM orders WHERE o_orderkey % 1009 = 0
        ),
        da AS (SELECT o_orderkey, o_orderkey % 64 AS bucket,
                      {_sql_row_digest('a')} AS h FROM a),
        db AS (SELECT o_orderkey, o_orderkey % 64 AS bucket,
                      {_sql_row_digest('b')} AS h FROM b),
        fa AS (SELECT bucket, COUNT(*) AS n_a, SUM(h) AS fp_a FROM da GROUP BY 1),
        fb AS (SELECT bucket, COUNT(*) AS n_b, SUM(h) AS fp_b FROM db GROUP BY 1),
        diff AS (
            SELECT COALESCE(fa.bucket, fb.bucket) AS bucket,
                   COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
            FROM fa FULL JOIN fb ON fa.bucket = fb.bucket
            WHERE COALESCE(fp_a, -1) <> COALESCE(fp_b, -1)
               OR COALESCE(n_a, 0) <> COALESCE(n_b, 0)
        ),
        dax AS (SELECT da.* FROM da JOIN diff d ON da.bucket = d.bucket),
        dbx AS (SELECT db.* FROM db JOIN diff d ON db.bucket = d.bucket),
        drill AS (
            SELECT COALESCE(dax.bucket, dbx.bucket) AS bucket,
                   COUNT(CASE WHEN dbx.o_orderkey IS NULL THEN 1 END) AS n_deleted,
                   COUNT(CASE WHEN dax.o_orderkey IS NULL THEN 1 END) AS n_inserted,
                   COUNT(CASE WHEN dax.o_orderkey IS NOT NULL
                              AND dbx.o_orderkey IS NOT NULL
                              AND dax.h <> dbx.h THEN 1 END) AS n_updated
            FROM dax FULL JOIN dbx
              ON dax.bucket = dbx.bucket AND dax.o_orderkey = dbx.o_orderkey
            GROUP BY 1
        )
        SELECT CAST(d.bucket AS BIGINT) AS bucket,
               CAST(d.n_a AS BIGINT) AS n_a, CAST(d.n_b AS BIGINT) AS n_b,
               CAST(dr.n_deleted AS BIGINT)  AS n_deleted,
               CAST(dr.n_inserted AS BIGINT) AS n_inserted,
               CAST(dr.n_updated AS BIGINT)  AS n_updated
        FROM diff d JOIN drill dr ON dr.bucket = d.bucket
    """,
    doc=(
        "Anti-entropy repair drill: 64-bucket fingerprint compare "
        "between a table and its mutated replica, then per-mismatched-"
        "bucket key-level diff (deleted/inserted/updated counts) — "
        "repair cost scales with the diff, not the table."
    ),
)
def table_diff_by_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    b = (
        orders.filter(F.col("o_orderkey") % 997 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 500 == 0, F.col("o_totalprice") + 1.00
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 1009 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )

    def digests(df: DataFrame) -> DataFrame:
        cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        canon = F.concat(
            F.col("o_orderkey").cast("string"), F.lit(":"), cents.cast("string")
        )
        return df.select(
            "o_orderkey",
            (F.col("o_orderkey") % 64).alias("bucket"),
            F.conv(F.substring(F.md5(canon.cast("binary")), 1, 10), 16, 10)
            .cast("long")
            .alias("h"),
        )

    da, db = digests(orders), digests(b)
    fa = da.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_a"), F.sum("h").alias("fp_a")
    )
    fb = db.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("h").alias("fp_b")
    )
    diff = (
        fa.join(fb, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            F.coalesce("fp_a", F.lit(-1)).alias("fp_a"),
            F.coalesce("fp_b", F.lit(-1)).alias("fp_b"),
        )
        .filter(
            (F.col("fp_a") != F.col("fp_b")) | (F.col("n_a") != F.col("n_b"))
        )
        .select("bucket", "n_a", "n_b")
    )
    # drill restricted to mismatched buckets: broadcast the bucket list
    bl = F.broadcast(diff.select("bucket"))
    da_d = da.join(bl, "bucket")
    db_d = db.join(bl, "bucket")
    keyed = da_d.alias("x").join(
        db_d.alias("y"),
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.o_orderkey") == F.col("y.o_orderkey")),
        "full",
    )
    drill = keyed.groupBy(
        F.coalesce(F.col("x.bucket"), F.col("y.bucket")).alias("bucket")
    ).agg(
        F.count(F.when(F.col("y.o_orderkey").isNull(), 1)).alias("n_deleted"),
        F.count(F.when(F.col("x.o_orderkey").isNull(), 1)).alias("n_inserted"),
        F.count(
            F.when(
                F.col("x.o_orderkey").isNotNull()
                & F.col("y.o_orderkey").isNotNull()
                & (F.col("x.h") != F.col("y.h")),
                1,
            )
        ).alias("n_updated"),
    )
    return diff.join(drill, "bucket").select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_deleted").cast("long").alias("n_deleted"),
        F.col("n_inserted").cast("long").alias("n_inserted"),
        F.col("n_updated").cast("long").alias("n_updated"),
    )


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance — the IVM algebra for a
# materialized join aggregate. A view V = agg(A ⋈ B) kept current as
# batches arrive must NOT recompute from scratch; with deltas ΔA, ΔB:
#
#   ΔV = agg(ΔA ⋈ B_old) ⊎ agg(A_old ⋈ ΔB) ⊎ agg(ΔA ⋈ ΔB)
#
# (⊎ = additive merge of count/sum partials — the same decomposability
# that makes partial aggregation work). The query splits orders and
# customer into old/delta slices deterministically, maintains
# per-nation revenue through the three-term delta, and emits the
# incremental result NEXT TO the full recompute with a consistency
# boolean — the IVM correctness proof as a hashed surface. At 100 TB
# the three delta joins touch |Δ|-sized inputs (broadcast the delta
# side); the full recompute exists here only as the oracle's witness.
# Beyond-reference addition (lakehouse/IVM family).
# ---------------------------------------------------------------------------


@register(
    "incremental_join_maintenance",
    oracle="""
        WITH a_old AS (SELECT * FROM orders   WHERE o_orderkey % 101 <> 0),
             a_new AS (SELECT * FROM orders   WHERE o_orderkey % 101 = 0),
             b_old AS (SELECT * FROM customer WHERE c_custkey % 89 <> 0),
             b_new AS (SELECT * FROM customer WHERE c_custkey % 89 = 0),
             term AS (
                SELECT c.c_nationkey AS nk, COUNT(*) AS n,
                       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents,
                       0 AS is_delta
                FROM a_old o JOIN b_old c ON o.o_custkey = c.c_custkey
                GROUP BY 1
                UNION ALL
                SELECT c.c_nationkey, COUNT(*),
                       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)), 1
                FROM a_new o JOIN b_old c ON o.o_custkey = c.c_custkey GROUP BY 1
                UNION ALL
                SELECT c.c_nationkey, COUNT(*),
                       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)), 1
                FROM a_old o JOIN b_new c ON o.o_custkey = c.c_custkey GROUP BY 1
                UNION ALL
                SELECT c.c_nationkey, COUNT(*),
                       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)), 1
                FROM a_new o JOIN b_new c ON o.o_custkey = c.c_custkey GROUP BY 1
             ),
             inc AS (
                SELECT nk,
                       CAST(SUM(CASE WHEN is_delta = 0 THEN n ELSE 0 END) AS BIGINT)
                           AS base_n,
                       CAST(SUM(CASE WHEN is_delta = 1 THEN n ELSE 0 END) AS BIGINT)
                           AS delta_n,
                       CAST(SUM(n) AS BIGINT)     AS total_n,
                       CAST(SUM(cents) AS BIGINT) AS total_cents
                FROM term GROUP BY 1
             ),
             full_v AS (
                SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                            AS BIGINT) AS cents
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1
             )
        SELECT CAST(i.nk AS BIGINT) AS nationkey,
               i.base_n, i.delta_n, i.total_n, i.total_cents,
               (i.total_n = f.n AND i.total_cents = f.cents) AS consistent
        FROM inc i JOIN full_v f ON i.nk = f.nk
    """,
    doc=(
        "Incremental view maintenance for a join aggregate: three-term "
        "delta algebra (dA*B + A*dB + dA*dB) merged into the base "
        "partials, emitted next to the full recompute with a "
        "consistency proof column."
    ),
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    a_old = orders.filter(F.col("o_orderkey") % 101 != 0)
    a_new = orders.filter(F.col("o_orderkey") % 101 == 0)
    b_old = cust.filter(F.col("c_custkey") % 89 != 0)
    b_new = cust.filter(F.col("c_custkey") % 89 == 0)
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")

    def term(a: DataFrame, b: DataFrame, is_delta: int) -> DataFrame:
        return (
            a.join(b, a["o_custkey"] == b["c_custkey"])
            .groupBy(F.col("c_nationkey").alias("nk"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
            .withColumn("is_delta", F.lit(is_delta))
        )

    terms = (
        term(a_old, b_old, 0)
        .unionByName(term(a_new, b_old, 1))
        .unionByName(term(a_old, b_new, 1))
        .unionByName(term(a_new, b_new, 1))
    )
    inc = terms.groupBy("nk").agg(
        F.sum(F.when(F.col("is_delta") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("base_n"),
        F.sum(F.when(F.col("is_delta") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("delta_n"),
        F.sum("n").cast("long").alias("total_n"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    full_v = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("f_n"),
            F.sum(cents).cast("long").alias("f_cents"),
        )
    )
    return inc.join(full_v, "nk").select(
        F.col("nk").cast("long").alias("nationkey"),
        "base_n",
        "delta_n",
        "total_n",
        "total_cents",
        (
            (F.col("total_n") == F.col("f_n"))
            & (F.col("total_cents") == F.col("f_cents"))
        ).alias("consistent"),
    )


@register(
    "scd2_point_in_time_daily",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type, ts_us
            FROM seq
            WHERE prev_type IS NULL OR event_type <> prev_type
        ),
        hist AS (
            SELECT user_id, event_type,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts_us) AS BIGINT)
                       AS version,
                   ts_us AS valid_from_us
            FROM changes
        ),
        days AS (
            SELECT DISTINCT epoch_us(date_trunc('day', ts)) AS day_us
            FROM events
        ),
        users AS (SELECT DISTINCT user_id FROM events),
        pit AS (
            SELECT s.user_id, s.day_us, h.event_type, h.version,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.user_id, s.day_us
                       ORDER BY h.valid_from_us DESC) AS rn
            FROM (SELECT u.user_id, d.day_us
                  FROM users u CROSS JOIN days d) s
            JOIN hist h
              ON h.user_id = s.user_id AND h.valid_from_us <= s.day_us
        )
        SELECT user_id, day_us, event_type, version
        FROM pit WHERE rn = 1
    """,
    doc=(
        "Point-in-time (PIT) join: for every (user, midnight) on the "
        "corpus day spine, the SCD2 dimension version valid at that "
        "instant — the feature-store / time-travel consumption query "
        "over the scd2_event_type_history table."
    ),
)
def scd2_point_in_time_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT via the as-of carry operator — no inequality join.

    100 TB: a naive PIT is an inequality join (probe.ts ≥ version.ts)
    — quadratic per user. ``operators/temporal.asof_join`` instead
    unions probes + versions and carries the latest version forward in
    ONE user-keyed window pass: cost is a single shuffle of
    (probes + versions), the same shape Delta/feature stores use for
    AS OF queries. The day spine is #days rows, broadcast to the
    user list map-side.
    """
    from stacktrend_spark.operators.temporal import asof_join

    hist = scd2_event_type_history(spark, sf_dir).select(
        "user_id", "event_type", "version", "valid_from_us"
    )
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us")
    ).distinct()
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(days))
    pit = asof_join(
        spine,
        hist,
        key="user_id",
        left_ts="day_us",
        right_ts="valid_from_us",
        right_payload=["event_type", "version"],
    )
    return pit.filter(F.col("asof_version").isNotNull()).select(
        "user_id",
        "day_us",
        F.col("asof_event_type").alias("event_type"),
        F.col("asof_version").alias("version"),
    )


@register(
    "scd_consistency_audit",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type, ts_us
            FROM seq
            WHERE prev_type IS NULL OR event_type <> prev_type
        ),
        hist AS (
            SELECT user_id, event_type,
                   LEAD(ts_us) OVER (PARTITION BY user_id
                                     ORDER BY ts_us) IS NULL AS is_current
            FROM changes
        ),
        cur AS (
            SELECT user_id, event_type AS scd2_type
            FROM hist WHERE is_current
        ),
        latest AS (
            SELECT user_id, event_type AS feed_type
            FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn
                FROM events
            ) WHERE rn = 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN scd2_type = feed_type
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
               CAST(SUM(CASE WHEN scd2_type <> feed_type
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
        FROM cur JOIN latest USING (user_id)
    """,
    doc=(
        "Dimension-consistency audit: the SCD2 history's is_current "
        "version must agree with a direct last-writer-wins read of the "
        "change feed for every entity (n_mismatch = 0 is the "
        "invariant) — the reconciliation check a lakehouse runs after "
        "rebuilding a dimension."
    ),
)
def scd_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: both sides shuffle once on the entity key and reduce to
    one row per entity before the audit join; the output is a single
    bounded row. Run it after every dimension rebuild — a nonzero
    n_mismatch means the change-collapse and the feed disagree."""
    hist = scd2_event_type_history(spark, sf_dir)
    cur = hist.filter(F.col("is_current")).select(
        "user_id", F.col("event_type").alias("scd2_type")
    )
    ev = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    latest = (
        ev.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("feed_type"))
    )
    return cur.join(latest, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(
            F.when(F.col("scd2_type") == F.col("feed_type"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_consistent"),
        F.sum(
            F.when(F.col("scd2_type") != F.col("feed_type"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_mismatch"),
    )


@register(
    "table_column_stats",
    oracle="""
        SELECT 'l_orderkey' AS column_name,
               CAST(COUNT(l_orderkey) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv,
               CAST(MIN(l_orderkey) AS BIGINT) AS min_i,
               CAST(MAX(l_orderkey) AS BIGINT) AS max_i
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey',
               CAST(COUNT(l_partkey) AS BIGINT),
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
               CAST(MIN(l_partkey) AS BIGINT),
               CAST(MAX(l_partkey) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_suppkey',
               CAST(COUNT(l_suppkey) AS BIGINT),
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
               CAST(MIN(l_suppkey) AS BIGINT),
               CAST(MAX(l_suppkey) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity',
               CAST(COUNT(l_quantity) AS BIGINT),
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
               CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT),
               CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT)
        FROM lineitem
    """,
    doc=(
        "ANALYZE TABLE mirror: exact per-column statistics (non-null "
        "count, NDV, min, max) for the key columns of the fact table — "
        "the numbers a cost-based optimizer and zone-map layout "
        "decisions feed on."
    ),
)
def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one scan computes ALL columns' stats together (a single
    aggregate with count/countDistinct/min/max per column, then an
    unpivot to rows) — NOT one scan per column like the naive UNION
    oracle; at production scale exact NDV per column would ride HLL
    (approx_count_distinct) with the exact form reserved for audits."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    aggs = []
    for c in cols:
        v = F.col(c).cast("long")
        aggs += [
            F.count(v).alias(f"nn_{c}"),
            F.countDistinct(v).alias(f"ndv_{c}"),
            F.min(v).alias(f"min_{c}"),
            F.max(v).alias(f"max_{c}"),
        ]
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, ndv_{c}, min_{c}, max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack})"
            " AS (column_name, n_nonnull, ndv, min_i, max_i)"
        )
    ).select(
        "column_name",
        F.col("n_nonnull").cast("long").alias("n_nonnull"),
        F.col("ndv").cast("long").alias("ndv"),
        F.col("min_i").cast("long").alias("min_i"),
        F.col("max_i").cast("long").alias("max_i"),
    )


def _gdpr_oracle() -> str:
    from stacktrend_spark.functions.hashing import sql_hex40

    h = sql_hex40("'pseud:' || CAST(e.user_id AS VARCHAR)")
    return f"""
        WITH erased AS (
            SELECT DISTINCT user_id FROM events
            WHERE user_id % 37 = 0
        ),
        rewritten AS (
            SELECT e.event_id,
                   CASE WHEN x.user_id IS NOT NULL
                        THEN ({h}) ELSE e.user_id END AS subject_id,
                   x.user_id IS NOT NULL AS pseudonymized
            FROM events e
            LEFT JOIN erased x ON x.user_id = e.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN pseudonymized THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pseudonymized,
               CAST(COUNT(DISTINCT CASE WHEN pseudonymized
                                        THEN subject_id END)
                    AS BIGINT) AS n_surrogates,
               CAST(MIN(CASE WHEN pseudonymized THEN subject_id END)
                    AS BIGINT) AS min_surrogate
        FROM rewritten
    """


@register(
    "gdpr_anonymize_cascade",
    oracle=_gdpr_oracle(),
    doc=(
        "Right-to-be-forgotten via PSEUDONYMIZATION (the alternative "
        "to hard delete that keeps aggregates stable): erased "
        "subjects' ids are rewritten to an md5-derived surrogate "
        "everywhere, with an audit of rows touched and surrogate "
        "cardinality. Surrogates are deterministic, so re-runs and "
        "both engines produce identical ids."
    ),
)
def gdpr_anonymize_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: the erased-subject list is dimension-sized → broadcast
    to a map-only rewrite of each fact table (compare
    compliance_delete_audit for the hard-delete path); with Delta
    present this is the same rewrite expressed as MERGE ... UPDATE.
    The audit aggregate is one pass over the rewritten stream."""
    from stacktrend_spark.functions.hashing import spark_hex40

    ev = load_table(spark, sf_dir, "events")
    erased = (
        ev.filter(F.col("user_id") % 37 == 0)
        .select("user_id")
        .distinct()
        .withColumnRenamed("user_id", "erased_id")
    )
    surrogate = spark_hex40(
        F.concat(F.lit("pseud:"), F.col("user_id").cast("string"))
    )
    rewritten = ev.join(
        F.broadcast(erased), F.col("user_id") == F.col("erased_id"), "left"
    ).select(
        "event_id",
        F.when(F.col("erased_id").isNotNull(), surrogate)
        .otherwise(F.col("user_id"))
        .alias("subject_id"),
        F.col("erased_id").isNotNull().alias("pseudonymized"),
    )
    return rewritten.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("pseudonymized"), 1).otherwise(0))
        .cast("long")
        .alias("n_pseudonymized"),
        F.countDistinct(
            F.when(F.col("pseudonymized"), F.col("subject_id"))
        )
        .cast("long")
        .alias("n_surrogates"),
        F.min(F.when(F.col("pseudonymized"), F.col("subject_id")))
        .cast("long")
        .alias("min_surrogate"),
    )


# ---------------------------------------------------------------------------
# GDPR subject-access export (r6) — Article 15's operational twin to
# gdpr_anonymize_cascade (Article 17): for a deterministic panel of
# data subjects (the 5 lowest custkeys with orders), inventory every
# table that holds their data — record counts per table plus exact
# value checksums (revenue cents, quantity) so the export is
# verifiable, not just countable. One row per (subject, table).
# 100 TB: each leg is a key-pruned scan/semi-join on the subject keys
# (broadcast 5-row panel) — the access request never scans more than
# the subject's slice after pushdown.
# ---------------------------------------------------------------------------
@register(
    "gdpr_subject_access_export",
    oracle=f"""
        WITH panel AS (
            SELECT DISTINCT o_custkey AS ck FROM orders
            ORDER BY ck LIMIT 5
        ),
        cust AS (
            SELECT c.c_custkey AS ck, 'customer' AS table_name,
                   CAST(COUNT(*) AS BIGINT) AS n_records,
                   CAST(SUM({sql_iscale('c.c_acctbal')}) AS BIGINT) AS value_checksum
            FROM customer c JOIN panel ON c.c_custkey = panel.ck
            GROUP BY 1
        ),
        ords AS (
            SELECT o.o_custkey AS ck, 'orders' AS table_name,
                   CAST(COUNT(*) AS BIGINT) AS n_records,
                   CAST(SUM({sql_iscale('o.o_totalprice')}) AS BIGINT) AS value_checksum
            FROM orders o JOIN panel ON o.o_custkey = panel.ck
            GROUP BY 1
        ),
        items AS (
            SELECT o.o_custkey AS ck, 'lineitem' AS table_name,
                   CAST(COUNT(*) AS BIGINT) AS n_records,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS value_checksum
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN panel ON o.o_custkey = panel.ck
            GROUP BY 1
        )
        SELECT ck AS custkey, table_name, n_records, value_checksum
        FROM (SELECT * FROM cust UNION ALL SELECT * FROM ords
              UNION ALL SELECT * FROM items)
    """,
    doc=(
        "GDPR Article-15 subject-access export for a 5-subject panel: "
        "per-table record counts + exact value checksums (balance "
        "cents / revenue cents / quantity) across customer, orders, "
        "lineitem — the verifiable data inventory; every leg key-"
        "pruned via the broadcast panel."
    ),
)
def gdpr_subject_access_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    panel = (
        orders.select(F.col("o_custkey").alias("ck"))
        .distinct()
        .orderBy("ck")
        .limit(5)
    )
    c_leg = (
        cust.join(F.broadcast(panel), cust.c_custkey == F.col("ck"))
        .groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(iscale("c_acctbal")).cast("long").alias("value_checksum"),
        )
        .select("ck", F.lit("customer").alias("table_name"), "n_records", "value_checksum")
    )
    o_leg = (
        orders.join(F.broadcast(panel), orders.o_custkey == F.col("ck"))
        .groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(iscale("o_totalprice")).cast("long").alias("value_checksum"),
        )
        .select("ck", F.lit("orders").alias("table_name"), "n_records", "value_checksum")
    )
    l_leg = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(panel), F.col("o_custkey") == F.col("ck"))
        .groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("value_checksum"),
        )
        .select("ck", F.lit("lineitem").alias("table_name"), "n_records", "value_checksum")
    )
    return (
        c_leg.unionByName(o_leg)
        .unionByName(l_leg)
        .select(F.col("ck").alias("custkey"), "table_name", "n_records", "value_checksum")
    )


# ---------------------------------------------------------------------------
# Snapshot retention / expire-snapshots audit (r8) — the Iceberg/Delta
# VACUUM planning question: given a ledger of table snapshots and the
# files each references, which files become deletable when only the
# newest R snapshots are retained? A file is expirable iff its NEWEST
# referencing snapshot is older than the retention horizon. The ledger
# here derives deterministically from orders: snapshot v (one per
# year, 1995->v=0) references file f iff f has order activity in year
# v or v-1 — a sliding two-snapshot reference window, so older files
# age out of newer snapshots the way real rewrites age out data files.
# Files are TIME-CLUSTERED (file = (orderkey DIV 2000)*10 + year-index,
# year in the LOW digit so the id never aliases across years at any
# orderkey range), matching how ingest actually lays out data files;
# orderkey-only grouping would give every file activity in every year
# and nothing would ever expire.
#
# 100 TB: the (file, version) reference set is one groupBy of the
# fact scan; the verdict is a per-file MAX — one shuffle on file_id,
# output O(#files). No snapshot x file cross product anywhere.
# ---------------------------------------------------------------------------
_RETAIN_LAST = 2  # keep the newest 2 snapshots (versions 5 and 6)


@register(
    "snapshot_retention_expiry",
    oracle=f"""
        WITH refs AS (
            SELECT DISTINCT
                   (o_orderkey // 2000) * 10
                       + CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) - 1995
                       AS file_id,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) - 1995 AS v
            FROM orders
        ),
        slid AS (
            SELECT file_id, v FROM refs
            UNION
            SELECT file_id, v + 1 AS v FROM refs WHERE v + 1 <= 6
        ),
        latest AS (
            SELECT file_id, MAX(v) AS latest_ref FROM slid GROUP BY file_id
        ),
        horizon AS (SELECT MAX(v) - {_RETAIN_LAST} + 1 AS keep_from FROM slid)
        SELECT CAST(l.latest_ref AS BIGINT) AS latest_ref_version,
               CAST(COUNT(*) AS BIGINT)     AS n_files,
               CAST(CASE WHEN l.latest_ref < h.keep_from THEN 1 ELSE 0 END
                    AS BIGINT)              AS is_expirable
        FROM latest l CROSS JOIN horizon h
        GROUP BY l.latest_ref, h.keep_from
    """,
    doc=(
        f"Expire-snapshots audit (retain newest {_RETAIN_LAST}): files "
        "grouped by their newest referencing snapshot version with the "
        "expirable verdict — the VACUUM planning aggregate."
    ),
)
def snapshot_retention_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    refs = orders.select(
        F.expr(
            "(o_orderkey DIV 2000) * 10 + year(o_orderdate) - 1995"
        ).cast("long").alias("file_id"),
        (F.year("o_orderdate").cast("long") - 1995).alias("v"),
    ).distinct()
    slid = refs.unionByName(
        refs.filter(F.col("v") + 1 <= 6).select(
            "file_id", (F.col("v") + 1).alias("v")
        )
    ).distinct()
    latest = slid.groupBy("file_id").agg(F.max("v").alias("latest_ref"))
    horizon = slid.agg(
        (F.max("v") - F.lit(_RETAIN_LAST) + F.lit(1)).alias("keep_from")
    )
    return (
        latest.join(F.broadcast(horizon))
        .groupBy("latest_ref", "keep_from")
        .agg(F.count(F.lit(1)).cast("long").alias("n_files"))
        .select(
            F.col("latest_ref").cast("long").alias("latest_ref_version"),
            "n_files",
            (F.col("latest_ref") < F.col("keep_from")).cast("long").alias(
                "is_expirable"
            ),
        )
    )
