"""Python API surface the reference never exercises (SURVEY §2.9:
"No UDAFs, no UDTFs, no pandas UDFs"): a Python UDTF and a vectorized
pandas-UDF grouped aggregate, both oracle-checked.

These exist to prove the FULL Python extension surface works, with the
engine's standing caveat (pyspark_guide: UDFs are the slow path):
anything expressible as built-in column functions should be — the
bigram UDTF's output is deliberately also derivable from
``F.transform``-style array ops (plans/northstar.py does shingles that
way), and a production pipeline would prefer that form. The UDAF shows
the pattern that is NOT expressible as builtins: an algorithm needing
the whole group's values at once (order statistics / trimming), done
Arrow-batched per group rather than row-at-a-time.

Determinism: both operators work in the exact scaled-integer domain
(functions/rounding.py policy) — the UDAF sums int64 cents after
sorting, so its double result is bit-identical to the SQL oracle's.

Scale: a UDTF fans out rows map-side (no shuffle); the grouped UDAF
shuffles once on the group key and holds ONE group per Arrow batch in
memory — fine for bounded groups (orders per priority), the wrong tool
for unbounded ones (use an algebraic/partial-aggregable form instead).
"""

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


@register(
    "udtf_bigrams",
    oracle="""
        WITH w AS (
            SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS toks FROM documents
        )
        SELECT
            doc_id,
            CAST(i AS BIGINT)             AS pos,
            toks[i] || ' ' || toks[i + 1] AS bigram
        FROM w, UNNEST(range(1, len(toks))) t(i)
    """,
    doc="Python UDTF (lateral table function): positional bigrams per document.",
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Defined INSIDE the query fn on purpose: (a) the udtf DDL return
    # type parses against the active session, and (b) cloudpickle
    # serializes a nested class BY VALUE, so executors don't need the
    # stacktrend_spark package on their sys.path (the grading driver
    # runs with an arbitrary cwd — a module-level class pickles by
    # reference and dies with ModuleNotFoundError on the workers).
    class BigramsUDTF:
        """Lateral table function: (pos, bigram) rows per input text."""

        def eval(self, text: str):
            toks = text.lower().split(" ")
            for i in range(len(toks) - 1):
                yield i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register(
        "bigrams_udtf", udtf(BigramsUDTF, returnType="pos bigint, bigram string")
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM _udtf_docs d, LATERAL bigrams_udtf(d.text) b
        """
    )


from pyspark.sql.types import DoubleType, LongType  # noqa: E402


@register(
    "udaf_trimmed_mean",
    oracle="""
        WITH c AS (
            SELECT
                o_orderpriority,
                CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders
        ),
        r AS (
            SELECT
                o_orderpriority, cents,
                ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
                COUNT(*)     OVER (PARTITION BY o_orderpriority)                AS n
            FROM c
        )
        SELECT
            o_orderpriority,
            CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*) AS trimmed_mean_price,
            CAST(COUNT(*) AS BIGINT)                      AS n_kept
        FROM r
        WHERE rn > CAST(FLOOR(n / 10) AS BIGINT)
          AND rn <= n - CAST(FLOOR(n / 10) AS BIGINT)
        GROUP BY o_orderpriority
    """,
    doc="Vectorized pandas-UDF grouped aggregate: exact 10%-trimmed mean per priority.",
)
def udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Nested so cloudpickle ships them by value (see udtf_bigrams).
    @pandas_udf(DoubleType())
    def trimmed_mean_price(v: pd.Series) -> float:
        """10%-trimmed mean in exact cents: sort, drop floor(n/10) from
        each tail, integer-sum the middle. The double division sequence
        matches the SQL oracle op-for-op, so results are bit-identical."""
        import numpy as np

        cents = np.sort(np.floor(v.to_numpy() * 100.0 + 0.5).astype("int64"))
        k = len(cents) // 10
        mid = cents[k : len(cents) - k]
        return float(mid.sum()) / 100.0 / len(mid)

    # Spark disallows mixing a group-agg pandas UDF with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — the companion count is
    # a second pandas UDF instead of F.count.
    @pandas_udf(LongType())
    def trimmed_kept(v: pd.Series) -> int:
        n = len(v)
        return n - 2 * (n // 10)

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        trimmed_mean_price("o_totalprice").alias("trimmed_mean_price"),
        trimmed_kept("o_totalprice").alias("n_kept"),
    )


@register(
    "cogroup_reconcile",
    oracle="""
        SELECT
            c.c_custkey,
            CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
            CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT)
                AS order_cents,
            CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    """,
    doc="Cogrouped applyInPandas: per-key (customer row × order group) reconciliation.",
)
def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API-surface demonstration cell — deliberately the per-key slow
    path. cogroup().applyInPandas invokes the Python kernel ONCE PER
    KEY (one pandas frame per customer), so wall-clock is dominated by
    ~1 ms/key dispatch (measured 17.4 s warm at sf0.1's 15 k keys —
    BENCH_LITE.json, r8). That cost is the cogroup contract, not a
    plan defect: the production twin for these semantics is the pure
    JVM left join + aggregate (join_left_customer_orders,
    q13_customer_distribution). Use cogroup only when the per-key
    kernel genuinely needs BOTH full row groups in Python at once."""
    # Nested so cloudpickle ships it by value (see udtf_bigrams).
    def _reconcile(key, customers: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        """Cogroup kernel: one output row per customer key, combining
        the customer row (0 or 1) with that key's order group (0..n
        rows). Exact int-cents sums keep the result oracle-identical."""
        import numpy as np

        cents = (
            int(np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
            if len(orders)
            else 0
        )
        bal = (
            int(np.floor(customers["c_acctbal"].to_numpy()[0] * 100.0 + 0.5))
            if len(customers)
            else None
        )
        return pd.DataFrame(
            {
                "c_custkey": [key[0]],
                "n_orders": [len(orders)],
                "order_cents": [cents],
                "acctbal_cents": [bal],
            }
        )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    out = (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy(F.col("o_custkey").alias("c_custkey")))
        .applyInPandas(
            _reconcile,
            "c_custkey long, n_orders long, order_cents long, acctbal_cents long",
        )
    )
    # oracle's LEFT JOIN keeps only customer-side keys; cogroup also
    # emits order-only keys (none in the testdata, but filter to match
    # the declared semantics regardless)
    return out.filter(F.col("acctbal_cents").isNotNull())


@register(
    "arrow_doc_stats",
    oracle="""
        SELECT
            doc_id,
            CAST(length(text) AS BIGINT) AS n_chars_utf8,
            CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
                                         AS n_spaces
        FROM documents
    """,
    doc=(
        "mapInArrow doc stats: zero-copy Arrow batches through "
        "pyarrow.compute kernels — the no-pandas-materialization path "
        "for byte/binary-level work; map-only, no shuffle."
    ),
)
def arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the Python-eval API surface next to the UDTF / pandas
    UDAF / cogrouped applyInPandas: ``mapInArrow`` hands the raw Arrow
    RecordBatch to Python with NO pandas conversion — for string/binary
    kernels that pyarrow.compute runs vectorized, the cheapest Python
    path there is (exact integer outputs, so cross-engine-safe)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                names=["doc_id", "n_chars_utf8", "n_spaces"],
            )

    return docs.mapInArrow(
        stats, "doc_id bigint, n_chars_utf8 bigint, n_spaces bigint"
    )


@register(
    "variant_props_rollup",
    oracle="""
        SELECT
            event_type,
            CAST(COUNT(*) AS BIGINT)                          AS n_events,
            CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
            CAST(COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS BIGINT)
                                                              AS n_distinct_k,
            CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY 1
    """,
    doc=(
        "Spark 4 VARIANT ingestion: parse_json once into a variant "
        "column, typed variant_get extraction, rollup — the "
        "schema-on-read path for semi-structured 100 TB event lakes "
        "(no per-query schema declaration, binary-encoded storage)."
    ),
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant twin of json_extract_props (plans/scalars.py): that one
    declares a struct schema up front; this one keeps the payload
    schema-flexible as VARIANT and extracts typed paths on demand —
    the right model when event payloads evolve faster than tables."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type",
        F.variant_get(F.col("p"), "$.k", "long").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.count_distinct(F.col("k")).cast("long").alias("n_distinct_k"),
        F.max("k").cast("long").alias("max_k"),
    )


@register(
    "grouped_map_mad",
    # lower-median convention keeps every output an exact integer:
    # med = sorted[(n-1)//2], mad = lower-median of |x - med| — both
    # selected by explicit ROW_NUMBER in the oracle, no interpolation
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events
        ),
        med AS (
            SELECT event_type, cents AS med_cents FROM (
                SELECT event_type, cents,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type ORDER BY cents) AS r,
                       COUNT(*) OVER (PARTITION BY event_type)     AS n
                FROM v
            ) WHERE r = (n - 1) // 2 + 1
        ),
        dev AS (
            SELECT v.event_type, ABS(v.cents - m.med_cents) AS d
            FROM v JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, d AS mad_cents FROM (
                SELECT event_type, d,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type ORDER BY d) AS r,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM dev
            ) WHERE r = (n - 1) // 2 + 1
        )
        SELECT m.event_type,
               CAST((SELECT COUNT(*) FROM v WHERE v.event_type = m.event_type)
                    AS BIGINT)                   AS n_events,
               CAST(m.med_cents AS BIGINT)       AS median_cents,
               CAST(a.mad_cents AS BIGINT)       AS mad_cents
        FROM med m JOIN mad a USING (event_type)
    """,
    doc=(
        "Grouped-map applyInPandas: per-event-type median + MAD in "
        "exact cents (lower-median convention — integer in, integer "
        "out). The grouped-map API surface: one pandas frame per "
        "group, groups process in parallel; group cardinality is "
        "bounded (event types), so no group outgrows a worker."
    ),
)
def grouped_map_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["cents"].sort_values().reset_index(drop=True)
        n = len(c)
        med = int(c.iloc[(n - 1) // 2])
        d = (pdf["cents"] - med).abs().sort_values().reset_index(drop=True)
        m = int(d.iloc[(n - 1) // 2])
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [n],
                "median_cents": [med],
                "mad_cents": [m],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        mad,
        schema=(
            "event_type string, n_events bigint, "
            "median_cents bigint, mad_cents bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Two-sided-clamped running balance — the canonical NON-ASSOCIATIVE
# scan. A wallet that gains `value` on each purchase and loses `value`
# on each error event, clamped into [0, CAP]:
#
#     bal_i = min(max(bal_{i-1} + delta_i, 0), CAP)
#
# (The one-sided floor-only variant has a prefix-sum closed form —
# bal_n = S_n - min(0, min_k S_k) — but the TWO-sided clamp does not:
# every prefix decomposition breaks at the first saturation, so no
# window frame computes it.) This is exactly the operator class that
# justifies the grouped-map escape hatch: applyInPandas partitioned by
# user — parallel ACROSS users, sequential WITHIN a user, the same
# execution contract as stateful streaming. The oracle replays the
# identical recurrence as a DuckDB RECURSIVE CTE stepping one row rank
# per iteration.
#
# All balances are exact scale-1e2 integers; the only float op is the
# final /1e2 display division.
#
# 100 TB: per-user sequences are bounded (a user's own events), groups
# hash-distribute; the Python loop is O(rows of one user) per task.
# The explicit repartition(32, user) pins the grouped-map shuffle
# width: AQE would otherwise coalesce this small exchange to ONE
# partition and serialize every per-group pandas construction through
# a single task (measured 7.2 s -> sub-second at sf0.1).
# ---------------------------------------------------------------------------
_BAL_CAP = 20_000  # cents (200.00): saturates both ways on this data


@register(
    "capped_running_balance",
    oracle=f"""
        WITH RECURSIVE tx AS (
            SELECT user_id,
                   CASE WHEN event_type = 'purchase'
                        THEN  CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                        ELSE -CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                   END AS delta,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_tx
            FROM events
            WHERE event_type IN ('purchase', 'error')
        ),
        rec AS (
            SELECT user_id, rn, n_tx,
                   LEAST(GREATEST(delta, 0), {_BAL_CAP}) AS bal,
                   CASE WHEN delta < 0 THEN 1 ELSE 0 END AS floor_hits,
                   CASE WHEN delta > {_BAL_CAP} THEN 1 ELSE 0 END AS cap_hits
            FROM tx WHERE rn = 1
            UNION ALL
            SELECT t.user_id, t.rn, t.n_tx,
                   LEAST(GREATEST(r.bal + t.delta, 0), {_BAL_CAP}),
                   r.floor_hits
                       + CASE WHEN r.bal + t.delta < 0 THEN 1 ELSE 0 END,
                   r.cap_hits
                       + CASE WHEN r.bal + t.delta > {_BAL_CAP} THEN 1 ELSE 0 END
            FROM rec r
            JOIN tx t ON t.user_id = r.user_id AND t.rn = r.rn + 1
        )
        SELECT user_id,
               CAST(bal AS DOUBLE) / 1e2        AS final_balance,
               CAST(floor_hits AS BIGINT)       AS floor_hits,
               CAST(cap_hits AS BIGINT)         AS cap_hits,
               CAST(n_tx AS BIGINT)             AS n_tx
        FROM rec WHERE rn = n_tx
    """,
    doc=(
        "Two-sided-clamped running balance: non-associative scan "
        "bal=clamp(bal+delta, 0, cap) per user — grouped-map "
        "applyInPandas (parallel across users, sequential within) with a "
        "pinned 32-way shuffle, oracle = recursive CTE replay; exact "
        "integer cents throughout."
    ),
)
def capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tx = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
            )
            .otherwise(-F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"))
            .alias("delta"),
        )
        .repartition(32, "user_id")
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal = 0
        floor_hits = 0
        cap_hits = 0
        for d in pdf["delta"].to_numpy():
            bal += int(d)
            if bal < 0:
                floor_hits += 1
                bal = 0
            elif bal > _BAL_CAP:
                cap_hits += 1
                bal = _BAL_CAP
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "final_balance": [bal / 100.0],
                "floor_hits": [floor_hits],
                "cap_hits": [cap_hits],
                "n_tx": [len(pdf)],
            }
        )

    return tx.groupBy("user_id").applyInPandas(
        replay,
        schema=(
            "user_id bigint, final_balance double, floor_hits bigint, "
            "cap_hits bigint, n_tx bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Grouped applyInArrow (r7) — completes the Python extension matrix:
# UDTF, pandas UDAF, cogrouped applyInPandas, mapInArrow, grouped-map
# applyInPandas, and now Spark 4's GROUPED Arrow path (applyInArrow):
# the group arrives as a pyarrow.Table (zero pandas conversion), the
# kernel computes exact order statistics on int64 cents, and the
# result returns as a pyarrow.Table. Quartile contract (deterministic,
# engine-neutral): r-th smallest with r = max(1, (n·q) DIV 100) — pure
# integer ranks, no interpolation, so the oracle rebuilds it exactly.
# 100 TB: one shuffle on the group key, one bounded group per Arrow
# batch — right for bounded groups (25 nations), documented-wrong for
# unbounded ones (the algebraic two-phase selection in
# exact_median_distributed is the scale path).
# ---------------------------------------------------------------------------
@register(
    "grouped_applyinarrow_iqr",
    oracle="""
        WITH vals AS (
            SELECT c_nationkey,
                   CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
            FROM customer
        ),
        ranked AS (
            SELECT c_nationkey, cents,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY cents) AS r,
                   COUNT(*) OVER (PARTITION BY c_nationkey) AS n
            FROM vals
        ),
        q AS (
            SELECT c_nationkey,
                   CAST(MAX(n) AS BIGINT) AS n,
                   MAX(CASE WHEN r = GREATEST(1, n * 25 // 100)
                            THEN cents END) AS q1_cents,
                   MAX(CASE WHEN r = GREATEST(1, n * 75 // 100)
                            THEN cents END) AS q3_cents
            FROM ranked GROUP BY 1
        )
        SELECT q.c_nationkey,
               q.n,
               CAST(q.q1_cents AS BIGINT) AS q1_cents,
               CAST(q.q3_cents AS BIGINT) AS q3_cents,
               CAST(q.q3_cents - q.q1_cents AS BIGINT) AS iqr_cents,
               CAST((SELECT COUNT(*) FROM vals v
                     WHERE v.c_nationkey = q.c_nationkey
                       AND (v.cents < q.q1_cents - 3 * (q.q3_cents - q.q1_cents) / 2
                         OR v.cents > q.q3_cents + 3 * (q.q3_cents - q.q1_cents) / 2))
                    AS BIGINT) AS n_outliers
        FROM q
    """,
    doc=(
        "Grouped applyInArrow (Spark 4 Arrow-native grouped map): "
        "per-nation exact integer quartiles (r = max(1, n·q DIV 100) "
        "rank contract), IQR, and 1.5-IQR outlier counts — the group "
        "arrives and returns as pyarrow Tables, no pandas hop."
    ),
)
def grouped_applyinarrow_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias("cents"),
    )

    def iqr_kernel(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.sort_indices(tbl["cents"])
        vals = pc.take(tbl["cents"], cents)
        n = len(vals)
        r1 = max(1, n * 25 // 100)
        r3 = max(1, n * 75 // 100)
        q1 = vals[r1 - 1].as_py()
        q3 = vals[r3 - 1].as_py()
        iqr = q3 - q1
        lo = q1 - 3 * iqr / 2
        hi = q3 + 3 * iqr / 2
        n_out = sum(1 for v in vals.to_pylist() if v < lo or v > hi)
        return pa.table(
            {
                "c_nationkey": pa.array(
                    [tbl["c_nationkey"][0].as_py()], type=pa.int64()
                ),
                "n": pa.array([n], type=pa.int64()),
                "q1_cents": pa.array([q1], type=pa.int64()),
                "q3_cents": pa.array([q3], type=pa.int64()),
                "iqr_cents": pa.array([iqr], type=pa.int64()),
                "n_outliers": pa.array([n_out], type=pa.int64()),
            }
        )

    return cust.groupBy("c_nationkey").applyInArrow(
        iqr_kernel,
        schema=(
            "c_nationkey long, n long, q1_cents long, q3_cents long,"
            " iqr_cents long, n_outliers long"
        ),
    )


# ---------------------------------------------------------------------------
# Arrow-optimized scalar Python UDF (r7) — completes the Python
# extension matrix's last cell: the SCALAR udf, in its Spark 4
# Arrow-optimized form (useArrow=True — Arrow batch transport instead
# of pickled rows; SPARK-40307). Registered DELIBERATELY as the
# slow-path demonstration the engine's standing policy warns about:
# this Luhn checksum is fully expressible with builtin transform/
# aggregate HOFs (the form a hot path must use); the UDF exists to
# prove the surface works and is value-checked like everything else.
# The oracle recomputes Luhn digit-by-digit in pure SQL.
# ---------------------------------------------------------------------------
@register(
    "arrow_scalar_udf_luhn",
    oracle="""
        WITH d AS (
            SELECT c_custkey,
                   lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS s
            FROM customer
        ),
        digits AS (
            SELECT c_custkey,
                   list_sum(
                     list_transform(
                       generate_series(1, 12),
                       i -> CASE
                              WHEN (13 - i) % 2 = 1 THEN
                                CASE WHEN 2 * CAST(s[i] AS INTEGER) > 9
                                     THEN 2 * CAST(s[i] AS INTEGER) - 9
                                     ELSE 2 * CAST(s[i] AS INTEGER) END
                              ELSE CAST(s[i] AS INTEGER)
                            END)) AS total
            FROM d
        )
        SELECT CAST((10 - total % 10) % 10 AS BIGINT) AS check_digit,
               CAST(COUNT(*) AS BIGINT)               AS n_keys
        FROM digits
        GROUP BY 1
    """,
    doc=(
        "Arrow-optimized scalar Python UDF (useArrow=True): Luhn check "
        "digit over zero-padded customer keys, grouped by digit — the "
        "slow-path demonstration cell of the Python matrix, "
        "value-checked against a pure-SQL Luhn."
    ),
)
def arrow_scalar_udf_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def luhn_check_digit(key: int) -> int:
        s = str(key).zfill(12)
        total = 0
        # positions from the right, 1-indexed: double every second
        for pos, ch in enumerate(reversed(s), start=1):
            v = int(ch)
            if pos % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            total += v
        return (10 - total % 10) % 10

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.select(luhn_check_digit(F.col("c_custkey")).alias("check_digit"))
        .groupBy(F.col("check_digit").cast("long").alias("check_digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
