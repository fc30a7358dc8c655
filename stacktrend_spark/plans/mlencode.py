"""Feature-encoding & distribution-shape statistics for ML prep.

Beyond-reference additions (training-data pipeline family; reference
capability anchor: SURVEY §2.4 aggregations / §2.8 scalar families —
the reference has no feature-encoding surface at all). Four operators
a feature-engineering pipeline needs before handing a table to a
trainer, all on the exact-integer discipline (ppm outputs, `DIV`) so
the driver's DuckDB oracle hashes bit-identically:

- ``target_encode_loo``   — leakage-safe leave-one-out target encoding
- ``chi2_segment_status`` — χ² contingency cells (feature relevance)
- ``gini_revenue_by_nation`` — concentration (label imbalance) metric
- ``simpson_diversity_events`` — per-entity class-mix diversity

100 TB notes: ``target_encode_loo`` aggregates to #categories rows and
BROADCASTS them back — the fact table never shuffles (map-side encode).
``chi2_segment_status`` reduces to #segments × #statuses cells before
any non-scan work; marginals are three tiny aggregates broadcast back
(no unpartitioned windows). ``gini_revenue_by_nation`` windows on the
nation key; groups are customer-count sized — for groups past ~10⁷
rows swap the rank for ``operators.ranking.global_rank_scalable``
range-partitioned within each nation. ``simpson_diversity_events`` is
two map-side-combinable aggregates on the same (user) key — one
shuffle, no skew (user_id is uniform). Wide products route through
DECIMAL(38,0) (HUGEINT in the oracle) so counts past int64 headroom
cannot silently wrap (ADVICE r5 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import iscale, sql_iscale, sql_xlog10
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table


@register(
    "target_encode_loo",
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_orderpriority,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        ag AS (
            SELECT o_orderpriority, SUM(y) AS s, COUNT(*) AS n
            FROM o GROUP BY 1
        )
        SELECT o.o_orderkey, o.o_orderpriority,
               CAST(o.y AS BIGINT) AS y,
               CAST(CASE WHEN ag.n > 1
                         THEN (ag.s - o.y) * 1000000 // (ag.n - 1)
                         ELSE 500000 END AS BIGINT) AS te_loo_ppm
        FROM o JOIN ag USING (o_orderpriority)
    """,
    doc=(
        "Leave-one-out target encoding of o_orderpriority against the "
        "binary target (o_orderstatus='F'): each row's encode excludes "
        "its own label — the standard leakage-safe categorical encode "
        "for tree/linear trainers; exact ppm integers."
    ),
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    ag = o.groupBy("o_orderpriority").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    # category table is #priorities rows — broadcast; the fact side
    # encodes map-side (zero fact shuffles)
    return o.join(F.broadcast(ag), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("y").cast("long").alias("y"),
        F.expr(
            "CASE WHEN n > 1 THEN (s - y) * 1000000 DIV (n - 1)"
            " ELSE 500000 END"
        )
        .cast("long")
        .alias("te_loo_ppm"),
    )


@register(
    "chi2_segment_status",
    oracle="""
        WITH cells AS (
            SELECT c.c_mktsegment, o.o_orderstatus, COUNT(*) AS obs
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        seg AS (SELECT c_mktsegment, SUM(obs) AS r FROM cells GROUP BY 1),
        st  AS (SELECT o_orderstatus, SUM(obs) AS c FROM cells GROUP BY 1),
        tot AS (SELECT SUM(obs) AS n FROM cells)
        SELECT cells.c_mktsegment, cells.o_orderstatus,
               CAST(cells.obs AS BIGINT) AS obs,
               CAST(CAST(seg.r AS HUGEINT) * st.c * 1000000 // tot.n
                    AS BIGINT) AS exp_ppm,
               CAST((CAST(tot.n AS HUGEINT) * cells.obs
                     - CAST(seg.r AS HUGEINT) * st.c)
                    * (CAST(tot.n AS HUGEINT) * cells.obs
                       - CAST(seg.r AS HUGEINT) * st.c)
                    * 1000000
                    // (CAST(tot.n AS HUGEINT) * seg.r * st.c)
                    AS BIGINT) AS cell_chi2_ppm
        FROM cells
        JOIN seg USING (c_mktsegment)
        JOIN st USING (o_orderstatus)
        CROSS JOIN tot
    """,
    doc=(
        "χ² independence contingency cells for customer segment × order "
        "status: observed count, expected count (ppm), and the cell's "
        "χ² contribution scaled ×10⁶ — Σ cells / 1e6 is the statistic. "
        "All arithmetic exact 128-bit integer (DECIMAL(38,0)/HUGEINT)."
    ),
)
def chi2_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    # marginals from the (bounded: #segments × #statuses) cell table —
    # three tiny aggregates broadcast back; no unpartitioned windows
    seg = cells.groupBy("c_mktsegment").agg(F.sum("obs").alias("r"))
    st = cells.groupBy("o_orderstatus").agg(F.sum("obs").alias("c"))
    tot = cells.agg(F.sum("obs").alias("n"))
    d = (
        "(CAST(n AS DECIMAL(38,0)) * obs - CAST(r AS DECIMAL(38,0)) * c)"
    )
    return (
        cells.join(F.broadcast(seg), "c_mktsegment")
        .join(F.broadcast(st), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "o_orderstatus",
            F.col("obs").cast("long").alias("obs"),
            F.expr(
                "CAST(r AS DECIMAL(38,0)) * c * 1000000"
                " DIV CAST(n AS DECIMAL(38,0))"
            )
            .cast("long")
            .alias("exp_ppm"),
            F.expr(
                f"{d} * {d} * 1000000"
                " DIV (CAST(n AS DECIMAL(38,0)) * r * c)"
            )
            .cast("long")
            .alias("cell_chi2_ppm"),
        )
    )


@register(
    "gini_revenue_by_nation",
    oracle=f"""
        WITH rev AS (
            SELECT o_custkey, SUM({sql_iscale("o_totalprice")}) AS rc
            FROM orders GROUP BY 1
        ),
        cust AS (
            SELECT c.c_nationkey, c.c_custkey,
                   COALESCE(rev.rc, 0) AS rev_cents
            FROM customer c LEFT JOIN rev ON rev.o_custkey = c.c_custkey
        ),
        ranked AS (
            SELECT c_nationkey, rev_cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY rev_cents, c_custkey) AS i
            FROM cust
        ),
        s AS (
            SELECT c_nationkey, COUNT(*) AS n,
                   SUM(rev_cents) AS sx,
                   SUM(CAST(i AS HUGEINT) * rev_cents) AS six
            FROM ranked GROUP BY 1
        )
        SELECT c_nationkey,
               CAST(n AS BIGINT) AS n_customers,
               CAST(sx AS BIGINT) AS revenue_cents,
               CAST(CASE WHEN sx = 0 THEN 0
                         ELSE (2 * CAST(six AS HUGEINT)
                               - (n + 1) * CAST(sx AS HUGEINT)) * 1000000
                              // (CAST(n AS HUGEINT) * sx)
                    END AS BIGINT) AS gini_ppm
        FROM s
    """,
    doc=(
        "Gini concentration of customer order revenue within each "
        "nation (sorted-rank formula, deterministic c_custkey "
        "tiebreak): G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) in exact ppm — "
        "the label-imbalance audit before stratified sampling."
    ),
)
def gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(iscale("o_totalprice")).alias("rc"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey")
        .join(rev, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "c_nationkey",
            "c_custkey",
            F.coalesce(F.col("rc"), F.lit(0)).alias("rev_cents"),
        )
    )
    i = F.row_number().over(
        W.partitionBy("c_nationkey").orderBy("rev_cents", "c_custkey")
    )
    s = (
        cust.withColumn("i", i)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rev_cents").alias("sx"),
            F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * rev_cents")).alias("six"),
        )
    )
    return s.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("revenue_cents"),
        F.expr(
            "CASE WHEN sx = 0 THEN 0"
            " ELSE (2 * CAST(six AS DECIMAL(38,0))"
            "       - (n + 1) * CAST(sx AS DECIMAL(38,0))) * 1000000"
            "      DIV (CAST(n AS DECIMAL(38,0)) * sx) END"
        )
        .cast("long")
        .alias("gini_ppm"),
    )


@register(
    "simpson_diversity_events",
    oracle="""
        WITH ct AS (
            SELECT user_id, event_type, COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT user_id, SUM(c) AS n, COUNT(*) AS n_types,
                   SUM(CAST(c AS HUGEINT) * c) AS ss
            FROM ct GROUP BY 1
        )
        SELECT user_id,
               CAST(n AS BIGINT) AS n_events,
               CAST(n_types AS BIGINT) AS n_types,
               CAST((CAST(n AS HUGEINT) * n - ss) * 1000000
                    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS simpson_ppm
        FROM s
    """,
    doc=(
        "Gini-Simpson diversity (1 − Σpᵢ²) of each user's event-type "
        "mix in exact ppm — the rational-arithmetic diversity index "
        "(entropy's log is engine-dependent libm; Simpson hashes "
        "bit-identically). Behavioral-mix feature per entity."
    ),
)
def simpson_diversity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ct = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = ct.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ss"),
    )
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("n_types").cast("long").alias("n_types"),
        F.expr(
            "(CAST(n AS DECIMAL(38,0)) * n - ss) * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * n)"
        )
        .cast("long")
        .alias("simpson_ppm"),
    )


# ---------------------------------------------------------------------------
# Binary-classifier AUC via the exact rank-sum (Mann-Whitney U)
# identity — the model-eval metric a training pipeline computes after
# every eval run. AUC = P(score⁺ > score⁻) + ½P(tie), computed WITHOUT
# materializing the n⁺·n⁻ pair space:
#
#   group by distinct score → (pos_cnt, neg_cnt) per score
#   running negatives-strictly-below via the two-phase range-
#     partitioned running sum (operators/ranking.py — no single-
#     partition window over the score spine)
#   2U = Σ (2·pos_s·neg_below(s) + pos_s·neg_s)   — exact integers
#   auc_ppm = 2U · 500000 DIV (n⁺·n⁻)
#
# Task: positive = label < 5; score = the first four embedding
# components cast to double and left-fold-summed (identical op order
# in both engines → identical doubles → identical spine).
#
# 100 TB: the only corpus shuffle is the distinct-score groupBy; the
# spine then range-partitions across the cluster (distinct float32
# scores, not rows), and the driver step is O(#partitions).
# ---------------------------------------------------------------------------
_AUC_SCORE_SQL = (
    "((CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE))"
    " + CAST(embedding[3] AS DOUBLE)) + CAST(embedding[4] AS DOUBLE)"
)


@register(
    "model_eval_auc",
    oracle=f"""
        WITH e AS (
            SELECT {_AUC_SCORE_SQL} AS score,
                   CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
            FROM embeddings
        ),
        per AS (
            SELECT score,
                   SUM(pos)     AS pos_cnt,
                   SUM(1 - pos) AS neg_cnt
            FROM e GROUP BY score
        ),
        c AS (
            SELECT pos_cnt, neg_cnt,
                   COALESCE(SUM(neg_cnt) OVER (
                       ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS neg_below
            FROM per
        )
        SELECT
            CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
            CAST(SUM(neg_cnt) AS BIGINT) AS n_neg,
            CAST(SUM(2 * pos_cnt * neg_below + pos_cnt * neg_cnt)
                 AS BIGINT)              AS u_stat_x2,
            CAST(SUM(2 * pos_cnt * neg_below + pos_cnt * neg_cnt) * 500000
                 // (SUM(pos_cnt) * SUM(neg_cnt)) AS BIGINT) AS auc_ppm
        FROM c
    """,
    doc=(
        "Exact AUC (Mann-Whitney 2U in integers, tie-corrected) over "
        "distinct scores; the cumulative-negatives spine uses the "
        "two-phase range-partitioned running sum — no single-partition "
        "window, no pos x neg pair materialization."
    ),
)
def model_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.operators.ranking import global_running_sum_scalable

    emb = load_table(spark, sf_dir, "embeddings")
    score = (
        (
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double")
        )
        + F.element_at("embedding", 3).cast("double")
    ) + F.element_at("embedding", 4).cast("double")
    pos = F.when(F.col("label") < 5, 1).otherwise(0)
    per = (
        emb.select(score.alias("score"), pos.alias("pos"))
        .groupBy("score")
        .agg(
            F.sum("pos").alias("pos_cnt"),
            F.sum(F.lit(1) - F.col("pos")).alias("neg_cnt"),
        )
    )
    rs = global_running_sum_scalable(
        per, [F.col("score")], "neg_cnt", sum_col="cum_incl", num_partitions=8
    )
    contrib = (
        F.lit(2) * F.col("pos_cnt") * (F.col("cum_incl") - F.col("neg_cnt"))
        + F.col("pos_cnt") * F.col("neg_cnt")
    )
    return rs.agg(
        F.sum("pos_cnt").alias("n_pos"),
        F.sum("neg_cnt").alias("n_neg"),
        F.sum(contrib).cast("long").alias("u_stat_x2"),
        # r13 degenerate-corpus fix: a single-class corpus (no
        # positives or no negatives) zeroed the Mann-Whitney divisor —
        # ANSI Spark crashed where DuckDB yields NULL (AUC undefined
        # without both classes)
        F.expr(
            "CASE WHEN SUM(pos_cnt) * SUM(neg_cnt) = 0 THEN NULL"
            " ELSE SUM(2 * pos_cnt * (cum_incl - neg_cnt) + pos_cnt * neg_cnt)"
            " * 500000 DIV (SUM(pos_cnt) * SUM(neg_cnt)) END"
        )
        .cast("long")
        .alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# Distributed PCA: first principal component of the embedding corpus
# via exact-integer covariance + normalized power iteration. The whole
# chain is engine-exact:
#
#   1. quantize x → q = floor(x·2²⁰ + 0.5)        (map-only)
#   2. raw grammian P_ij = Σ_vec q_i·q_j          (LONG products —
#      codegen hot path; per-group sums in DECIMAL/HUGEINT)
#   3. exact centering on the 2080-entry result:
#      C_ij = n²·P_ij − n·S_i·S_j  ≡  Σ (n·q_i − S_i)(n·q_j − S_j)
#      (the n² scale cancels in the eigenvector)
#   4. normalize Cn = C·10⁶ DIV max|C|             (both engines
#      truncate toward zero for negatives: Spark DIV ≡ DuckDB // —
#      verified this round, PARITY discipline)
#   5. three power-iteration steps from v₀ = 10⁶·1: u = Cn·v,
#      v ← u·10⁶ DIV max|u| — every product fits a BIGINT, every
#      rescale runs in DECIMAL(38,0)/HUGEINT.
#
# 100 TB: the ONLY corpus-scale work is steps 1-3 — one explode +
# map-side-combinable (dim_i, dim_j) aggregate (d(d+1)/2 = 2080
# groups); the 64×64 matrix and 64-vector iterations are
# constant-size no matter the corpus. This is exactly how Spark MLlib
# computes PCA (grammian then local eigensolve), re-expressed as pure
# relational plans with an integer-exact oracle.
# ---------------------------------------------------------------------------
_PCA_DIM = 64
_PCA_QSCALE = 1 << 20
_PCA_ITERS = 3


def _pca_oracle() -> str:
    ctes = [
        f"""d AS (
            SELECT vec_id, k AS dim,
                   CAST(FLOOR(CAST(embedding[k + 1] AS DOUBLE)
                              * {_PCA_QSCALE}.0 + 0.5) AS BIGINT) AS q
            FROM embeddings, UNNEST(RANGE({_PCA_DIM})) AS t(k)
        )""",
        "nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM d)",
        """s AS (SELECT dim, SUM(q) AS sq FROM d GROUP BY dim)""",
        """p AS (
            SELECT a.dim AS i, b.dim AS j,
                   SUM(CAST(a.q * b.q AS HUGEINT)) AS pp
            FROM d a JOIN d b
              ON a.vec_id = b.vec_id AND a.dim <= b.dim
            GROUP BY a.dim, b.dim
        )""",
        """tri AS (
            SELECT p.i, p.j,
                   CAST((SELECT n FROM nn) AS HUGEINT)
                       * CAST((SELECT n FROM nn) AS HUGEINT) * p.pp
                   - CAST((SELECT n FROM nn) AS HUGEINT)
                       * CAST(si.sq AS HUGEINT) * CAST(sj.sq AS HUGEINT)
                       AS c
            FROM p JOIN s si ON si.dim = p.i JOIN s sj ON sj.dim = p.j
        )""",
        "m0 AS (SELECT MAX(ABS(c)) AS m FROM tri)",
        """mat AS (
            SELECT i, j, CAST(c * 1000000 // (SELECT m FROM m0) AS BIGINT)
                       AS cn
            FROM tri
            UNION ALL
            SELECT j AS i, i AS j,
                   CAST(c * 1000000 // (SELECT m FROM m0) AS BIGINT) AS cn
            FROM tri WHERE i <> j
        )""",
        "v0 AS (SELECT i AS dim, CAST(1000000 AS BIGINT) AS v FROM mat GROUP BY i)",
    ]
    for k in range(1, _PCA_ITERS + 1):
        ctes.append(
            f"""u{k} AS (
                SELECT m.i AS dim, SUM(m.cn * v.v) AS u
                FROM mat m JOIN v{k - 1} v ON v.dim = m.j
                GROUP BY m.i
            )"""
        )
        ctes.append(f"mm{k} AS (SELECT MAX(ABS(u)) AS m FROM u{k})")
        ctes.append(
            f"""v{k} AS (
                SELECT dim,
                       CAST(CAST(u AS HUGEINT) * 1000000
                            // (SELECT m FROM mm{k}) AS BIGINT) AS v
                FROM u{k}
            )"""
        )
    return f"""
        WITH {", ".join(ctes)}
        SELECT CAST(dim AS BIGINT) AS dim, v AS pc1_scaled
        FROM v{_PCA_ITERS}
    """


@register(
    "pca_power_iteration",
    oracle=_pca_oracle(),
    doc=(
        "First principal component of the embedding corpus: exact "
        "integer covariance (quantized, centered via n*q - S) + "
        f"{_PCA_ITERS} normalized power-iteration steps in pure "
        "integer arithmetic. Corpus touched once; the 64x64 eigen "
        "solve is constant-size."
    ),
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("x").cast("double") * F.lit(float(_PCA_QSCALE)) + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    nn = d.agg(F.countDistinct("vec_id").cast("long").alias("n"))
    s = d.groupBy("dim").agg(F.sum("q").alias("sq"))
    # raw grammian P_ij = Σ q_i·q_j: the products stay in LONG (q ≤
    # ~2^20·|x|, so q_i·q_j ≲ 1e11 — whole-stage codegen, no per-row
    # decimal); only the 2080-entry centering n²·P − n·S_i·S_j below
    # runs in DECIMAL(38,0). Algebraically identical to Σ dev_i·dev_j
    # with dev = n·q − S (cross terms collapse), measured ~2× faster.
    a = d.alias("a")
    b = d.select(
        F.col("vec_id").alias("vec_b"),
        F.col("dim").alias("j"),
        F.col("q").alias("q_b"),
    )
    dec = "decimal(38,0)"
    p = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("vec_b")) & (F.col("a.dim") <= F.col("j")),
        )
        .groupBy(F.col("a.dim").alias("i"), "j")
        .agg(F.sum((F.col("a.q") * F.col("q_b")).cast(dec)).alias("pp"))
    )
    si = s.select(F.col("dim").alias("i"), F.col("sq").alias("si"))
    sj = s.select(F.col("dim").alias("j"), F.col("sq").alias("sj"))
    tri = (
        p.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .join(F.broadcast(nn))
        .select(
            "i",
            "j",
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * pp"
                " - CAST(n AS DECIMAL(38,0)) * CAST(si AS DECIMAL(38,0))"
                "   * CAST(sj AS DECIMAL(38,0))"
            ).alias("c"),
        )
    )
    # The normalized power iteration runs on the CONSTANT-SIZE (2080
    # triangle entries → 64×64) matrix — one grouped-map task, exactly
    # MLlib's grammian-then-local-eigensolve split. Python ints give
    # the same arbitrary-precision arithmetic as the oracle's HUGEINT;
    # divisions mirror DIV/'//' truncate-toward-zero (divisors are
    # max|·| > 0, so only the dividend carries sign).
    import pandas as pd

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        def tdiv(a: int, m: int) -> int:  # truncate toward zero, m > 0
            return -((-a) // m) if a < 0 else a // m

        cov: dict[tuple[int, int], int] = {}
        for i, j, c in zip(pdf["i"], pdf["j"], pdf["c"]):
            c = int(c)
            cov[(int(i), int(j))] = c
            if i != j:
                cov[(int(j), int(i))] = c
        m0 = max(abs(c) for c in cov.values())
        dims_all = sorted({i for i, _ in cov})
        # r13 degenerate-corpus fix: an all-constant embedding corpus
        # has a ZERO covariance matrix (m0 = 0) — the normalization
        # divided by zero on the Python side and killed the query,
        # while the oracle's HUGEINT // 0 yields NULL per dim. The
        # principal direction is undefined there → NULL pc1 per dim.
        if m0 == 0:
            return pd.DataFrame(
                {"dim": dims_all, "pc1_scaled": [None] * len(dims_all)}
            )
        mat = {k: tdiv(c * 1_000_000, m0) for k, c in cov.items()}
        dims = sorted({i for i, _ in mat})
        v = {i: 1_000_000 for i in dims}
        for _ in range(_PCA_ITERS):
            u = {
                i: sum(mat[(i, j)] * v[j] for j in dims if (i, j) in mat)
                for i in dims
            }
            m = max(abs(x) for x in u.values())
            v = {i: tdiv(x * 1_000_000, m) for i, x in u.items()}
        return pd.DataFrame(
            {"dim": dims, "pc1_scaled": [v[i] for i in dims]}
        )

    return (
        tri.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(solve, schema="dim bigint, pc1_scaled bigint")
    )


# ---------------------------------------------------------------------------
# Expected-calibration-error reliability diagram — the companion
# metric to model_eval_auc: is the model's CONFIDENCE honest, not
# just its ranking? Confidence is the score's exact percentile rank
# (rows strictly below ÷ (n−1), in ppm) — rank-calibration, so the
# whole chain stays integer-exact. Ten equal-width bins; per bin the
# mean confidence vs the realized positive rate, gap and n·gap
# (the ECE numerator) as exact ppm integers.
#
# 100 TB: same shape as AUC — one distinct-score groupBy, the
# two-phase range-partitioned running sum over the score spine, then
# a 10-row bin rollup. No corpus-sized window, no pair space.
# ---------------------------------------------------------------------------
@register(
    "model_calibration_ece",
    oracle=f"""
        WITH e AS (
            SELECT {_AUC_SCORE_SQL} AS score,
                   CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
            FROM embeddings
        ),
        per AS (
            SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
                   SUM(pos) AS pos_cnt
            FROM e GROUP BY score
        ),
        n AS (SELECT SUM(c) AS n FROM per),
        r AS (
            SELECT score, c, pos_cnt,
                   COALESCE(SUM(c) OVER (
                       ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS below
            FROM per
        ),
        conf AS (
            SELECT c, pos_cnt,
                   below * 1000000 // ((SELECT n FROM n) - 1) AS conf_ppm
            FROM r
        )
        SELECT
            CAST(LEAST(conf_ppm // 100000, 9) AS BIGINT)      AS bin,
            CAST(SUM(c) AS BIGINT)                            AS n_rows,
            CAST(SUM(conf_ppm * c) // SUM(c) AS BIGINT)       AS avg_conf_ppm,
            CAST(SUM(pos_cnt) * 1000000 // SUM(c) AS BIGINT)  AS frac_pos_ppm,
            CAST(ABS(SUM(conf_ppm * c) // SUM(c)
                     - SUM(pos_cnt) * 1000000 // SUM(c)) AS BIGINT)
                                                              AS gap_ppm,
            CAST(SUM(c) * ABS(SUM(conf_ppm * c) // SUM(c)
                     - SUM(pos_cnt) * 1000000 // SUM(c)) AS BIGINT)
                                                              AS weighted_gap
        FROM conf
        GROUP BY 1
    """,
    doc=(
        "Reliability diagram / ECE: confidence = exact percentile-rank "
        "ppm via the two-phase running sum, 10 equal-width bins, "
        "per-bin mean confidence vs realized positive rate and the "
        "exact n*gap ECE numerator."
    ),
)
def model_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.operators.ranking import global_running_sum_scalable

    emb = load_table(spark, sf_dir, "embeddings")
    score = (
        (
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double")
        )
        + F.element_at("embedding", 3).cast("double")
    ) + F.element_at("embedding", 4).cast("double")
    pos = F.when(F.col("label") < 5, 1).otherwise(0)
    per = (
        emb.select(score.alias("score"), pos.alias("pos"))
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("pos").alias("pos_cnt"),
        )
    )
    rs = global_running_sum_scalable(
        per, [F.col("score")], "c", sum_col="cum_incl", num_partitions=8
    )
    nn = per.agg(F.sum("c").alias("n"))
    conf = (
        rs.join(F.broadcast(nn))
        .select(
            "c",
            "pos_cnt",
            # r13 degenerate-corpus fix: a 1-score corpus has n - 1 = 0 —
            # ANSI Spark crashed where DuckDB yields NULL conf (LEAST
            # then drops the NULL and the row lands in bin 9 on both)
            F.expr(
                "CASE WHEN n = 1 THEN NULL"
                " ELSE (cum_incl - c) * 1000000 DIV (n - 1) END"
            ).alias("conf_ppm"),
        )
    )
    return (
        conf.groupBy(
            F.least(F.expr("conf_ppm DIV 100000"), F.lit(9))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.expr("SUM(conf_ppm * c) DIV SUM(c)")
            .cast("long")
            .alias("avg_conf_ppm"),
            F.expr("SUM(pos_cnt) * 1000000 DIV SUM(c)")
            .cast("long")
            .alias("frac_pos_ppm"),
            F.expr(
                "ABS(SUM(conf_ppm * c) DIV SUM(c)"
                " - SUM(pos_cnt) * 1000000 DIV SUM(c))"
            )
            .cast("long")
            .alias("gap_ppm"),
            F.expr(
                "SUM(c) * ABS(SUM(conf_ppm * c) DIV SUM(c)"
                " - SUM(pos_cnt) * 1000000 DIV SUM(c))"
            )
            .cast("long")
            .alias("weighted_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram-based decision-stump split finding (r6) — the inner loop of
# every distributed GBDT (XGBoost/LightGBM "hist" mode): aggregate the
# fact table once into fixed-width feature-bin histograms of (count,
# positives), then score every bin boundary as a candidate split with a
# ppm-quantized weighted Gini impurity. The criterion is defined AS the
# integer formula below (both engines compute it verbatim), so argmin
# and scores are bit-exact:
#
#   bin        = cents(o_totalprice) DIV 2·10⁶      ($20k-wide bins)
#   pL_ppm     = posL·10⁶ DIV nL  (etc.)
#   gini_ppm   = 10⁶ − (p_ppm² + q_ppm²) DIV 10⁶
#   cost_ppm   = (nL·giniL + nR·giniR) DIV n
#
# ppm proportions bound every product by 10¹² regardless of corpus
# size (nL·gini ≤ n·10⁶ — int64-safe past 10¹² rows).
# 100 TB: the ONLY fact pass is the map-side-combinable histogram agg
# (≈25 groups); cumulative sums + split scoring run on that bounded
# spine (the WindowExec-global warning class documented "bounded by
# construction", same as exact_median_distributed's bucket spine).
# ---------------------------------------------------------------------------
@register(
    "gbdt_split_histogram",
    oracle="""
        WITH hist AS (
            SELECT CAST(FLOOR((o_totalprice) * 100.0 + 0.5) AS BIGINT) // 2000000 AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_bin,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos_bin
            FROM orders GROUP BY 1
        ),
        cum AS (
            SELECT bin,
                   CAST(SUM(n_bin)   OVER (ORDER BY bin) AS BIGINT) AS n_left,
                   CAST(SUM(pos_bin) OVER (ORDER BY bin) AS BIGINT) AS pos_left,
                   CAST(SUM(n_bin)   OVER () AS BIGINT) AS n_all,
                   CAST(SUM(pos_bin) OVER () AS BIGINT) AS pos_all
            FROM hist
        ),
        scored AS (
            SELECT bin AS split_bin, n_left, pos_left,
                   n_all - n_left   AS n_right,
                   pos_all - pos_left AS pos_right,
                   (
                     n_left * (1000000 - (
                        (pos_left*1000000//n_left) * (pos_left*1000000//n_left)
                      + ((n_left-pos_left)*1000000//n_left) * ((n_left-pos_left)*1000000//n_left)
                     ) // 1000000)
                   + (n_all-n_left) * (1000000 - (
                        ((pos_all-pos_left)*1000000//(n_all-n_left)) * ((pos_all-pos_left)*1000000//(n_all-n_left))
                      + ((n_all-n_left-pos_all+pos_left)*1000000//(n_all-n_left)) * ((n_all-n_left-pos_all+pos_left)*1000000//(n_all-n_left))
                     ) // 1000000)
                   ) // n_all AS cost_ppm
            FROM cum
            WHERE n_all - n_left > 0
        )
        SELECT split_bin, n_left, pos_left, n_right, pos_right,
               CAST(cost_ppm AS BIGINT) AS cost_ppm
        FROM scored
        ORDER BY cost_ppm ASC, split_bin ASC
        LIMIT 5
    """,
    doc=(
        "GBDT 'hist'-mode split finding as a stump: one map-side "
        "histogram pass over orders (totalprice $20k bins, label = "
        "high order priority), then every boundary scored with a "
        "ppm-integer weighted Gini; top-5 splits by cost. The split "
        "criterion is the same integer op tree in both engines."
    ),
)
def gbdt_split_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: histogram aggregation is the canonical scale trick —
    the fact table reduces map-side to #bins rows no matter the row
    count, and split scoring is O(#bins) on the driver-side-sized
    spine (still expressed as a plan; no collect). Growing this stump
    into boosted trees = re-running the same histogram agg on
    residual-weighted labels."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderpriority"
    )
    hist = (
        orders.select(
            iscale("o_totalprice").alias("cents"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_pos"),
        )
        .select(F.expr("cents DIV 2000000").alias("bin"), "is_pos")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bin"),
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).cast("long").alias("pos_bin"),
        )
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = hist.select(
        "bin",
        F.sum("n_bin").over(w).cast("long").alias("n_left"),
        F.sum("pos_bin").over(w).cast("long").alias("pos_left"),
        F.sum("n_bin").over(wall).cast("long").alias("n_all"),
        F.sum("pos_bin").over(wall).cast("long").alias("pos_all"),
    )
    scored = (
        cum.filter(F.col("n_all") - F.col("n_left") > 0)
        .select(
            F.col("bin").alias("split_bin"),
            "n_left",
            "pos_left",
            (F.col("n_all") - F.col("n_left")).alias("n_right"),
            (F.col("pos_all") - F.col("pos_left")).alias("pos_right"),
            F.expr(
                """
                (
                  n_left * (1000000 - (
                     (pos_left*1000000 DIV n_left) * (pos_left*1000000 DIV n_left)
                   + ((n_left-pos_left)*1000000 DIV n_left) * ((n_left-pos_left)*1000000 DIV n_left)
                  ) DIV 1000000)
                + (n_all-n_left) * (1000000 - (
                     ((pos_all-pos_left)*1000000 DIV (n_all-n_left)) * ((pos_all-pos_left)*1000000 DIV (n_all-n_left))
                   + ((n_all-n_left-pos_all+pos_left)*1000000 DIV (n_all-n_left)) * ((n_all-n_left-pos_all+pos_left)*1000000 DIV (n_all-n_left))
                  ) DIV 1000000)
                ) DIV n_all
                """
            )
            .cast("long")
            .alias("cost_ppm"),
        )
    )
    return scored.orderBy(F.asc("cost_ppm"), F.asc("split_bin")).limit(5)


# ---------------------------------------------------------------------------
# Isotonic calibration via the minimax closed form (r6). The companion
# to model_calibration_ece: where ECE *measures* miscalibration,
# isotonic regression *repairs* it — the standard post-hoc calibrator
# (Zadrozny & Elkan 2002). Pool-Adjacent-Violators is sequential, but
# on the bounded reliability spine the CLOSED FORM applies:
#
#   iso(i) = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k)
#
# with weighted bin means as ppb integers (Σpos·10⁹ DIV Σn), so the
# whole fit is MIN/MAX over int64 — bit-exact in both engines, and
# monotone by construction. B = 20 equal-width score bins ⇒ the (j,k)
# pair table is ≤ B² = 400 rows and the (i,j,k) expansion ≤ ~1.5k —
# constant-size regardless of corpus.
# 100 TB: ONE map-side histogram shuffle over the fact table (20
# groups); everything after runs on the constant spine. The bounded
# global windows/joins here are the documented "bounded by
# construction" class.
# ---------------------------------------------------------------------------
@register(
    "isotonic_calibration_minimax",
    oracle="""
        WITH hist AS (
            SELECT CAST(FLOOR((o_totalprice) * 100.0 + 0.5) AS BIGINT)
                       // 2500000 AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_bin,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos_bin
            FROM orders GROUP BY 1
        ),
        cum AS (
            SELECT bin, n_bin, pos_bin,
                   CAST(SUM(n_bin)   OVER (ORDER BY bin) AS BIGINT) AS cn,
                   CAST(SUM(pos_bin) OVER (ORDER BY bin) AS BIGINT) AS cp
            FROM hist
        ),
        pairs AS (
            SELECT lo.bin AS j, hi.bin AS k,
                   CAST(CAST(hi.cp - lo.cp + lo.pos_bin AS HUGEINT)
                        * 1000000000
                       // (hi.cn - lo.cn + lo.n_bin) AS BIGINT) AS mean_ppb
            FROM cum lo JOIN cum hi ON lo.bin <= hi.bin
        ),
        inner_min AS (
            SELECT b.bin AS i, p.j,
                   MIN(p.mean_ppb) AS min_ppb
            FROM (SELECT bin FROM hist) b
            JOIN pairs p ON p.j <= b.bin AND p.k >= b.bin
            GROUP BY 1, 2
        ),
        iso AS (
            SELECT i AS bin, MAX(min_ppb) AS iso_rate_ppb
            FROM inner_min GROUP BY 1
        )
        SELECT h.bin, h.n_bin, h.pos_bin,
               CAST(CAST(h.pos_bin AS HUGEINT) * 1000000000
                    // h.n_bin AS BIGINT) AS raw_rate_ppb,
               CAST(iso.iso_rate_ppb AS BIGINT) AS iso_rate_ppb
        FROM hist h JOIN iso ON h.bin = iso.bin
    """,
    doc=(
        "Isotonic calibration of the per-bin positive rate (orders, "
        "$25k totalprice bins, label = high priority) via the exact "
        "minimax closed form iso(i) = max_{j<=i} min_{k>=i} "
        "mean(j..k) on ppb-integer weighted means — PAV's fixpoint "
        "without PAV's sequential pooling, monotone by construction, "
        "bit-exact across engines."
    ),
)
def isotonic_calibration_minimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one histogram shuffle (20 groups) is the only pass over
    the fact table; the minimax expansion is O(B^3) on a CONSTANT
    20-bin spine (~1.5k rows) — the closed form turns a sequential
    algorithm into joins precisely because the spine is bounded. The
    same shape calibrates any score column (model confidence, rank
    features) against any binary outcome."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderpriority"
    )
    hist = (
        orders.select(
            iscale("o_totalprice").alias("cents"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_pos"),
        )
        .select(F.expr("cents DIV 2500000").alias("bin"), "is_pos")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bin"),
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
            .cast("long")
            .alias("pos_bin"),
        )
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "bin",
        "n_bin",
        "pos_bin",
        F.sum("n_bin").over(w).cast("long").alias("cn"),
        F.sum("pos_bin").over(w).cast("long").alias("cp"),
    )
    lo, hi = cum.alias("lo"), cum.alias("hi")
    pairs = lo.join(hi, F.col("lo.bin") <= F.col("hi.bin")).select(
        F.col("lo.bin").alias("j"),
        F.col("hi.bin").alias("k"),
        # width: cp/cn are cumulative FACT-TABLE counts — at ~1e11
        # rows the *1e9 numerator exceeds 2^63 (Spark wraps, DuckDB
        # errors); widen to DECIMAL(38,0)/HUGEINT, quotient <= 1e9
        # lands back in BIGINT (r9 width sweep)
        F.expr(
            "CAST(CAST(hi.cp - lo.cp + lo.pos_bin AS DECIMAL(38, 0))"
            " * 1000000000"
            " DIV (hi.cn - lo.cn + lo.n_bin) AS BIGINT)"
        ).alias("mean_ppb"),
    )
    bins = hist.select("bin")
    inner_min = (
        bins.join(pairs, (pairs.j <= bins.bin) & (pairs.k >= bins.bin))
        .groupBy(F.col("bin").alias("i"), "j")
        .agg(F.min("mean_ppb").alias("min_ppb"))
    )
    iso = inner_min.groupBy(F.col("i").alias("bin")).agg(
        F.max("min_ppb").alias("iso_rate_ppb")
    )
    return (
        hist.join(iso, "bin")
        .select(
            "bin",
            "n_bin",
            "pos_bin",
            F.expr(
                "CAST(CAST(pos_bin AS DECIMAL(38, 0)) * 1000000000"
                " DIV n_bin AS BIGINT)"
            ).alias("raw_rate_ppb"),
            F.col("iso_rate_ppb").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Cumulative gains / lift deciles (r6) — the third model-eval surface
# next to model_eval_auc (ranking) and model_calibration_ece
# (calibration): sort by score descending, cut into 10 equal-depth
# deciles (NTILE with a deterministic scorekey tiebreak), report per-
# decile and cumulative positive capture plus lift vs base rate — the
# campaign-targeting curve. All integers: counts, ppm shares, and
# lift_ppm = capture_ppm·10⁶ DIV depth_ppm.
# 100 TB: one fact pass; the decile assignment is the global-rank
# class (swap in the two-phase scalable rank past ~10⁷ rows, same
# discipline as spearman_rank_corr); everything after is a 10-row agg.
# ---------------------------------------------------------------------------
@register(
    "model_gains_deciles",
    oracle="""
        WITH scored AS (
            SELECT o_orderkey,
                   o_totalprice AS score,
                   CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END AS y,
                   NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                       AS decile
            FROM orders
        ),
        tot AS (SELECT SUM(y) AS pos_all, COUNT(*) AS n_all FROM scored),
        per AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(y) AS BIGINT)   AS n_pos
            FROM scored GROUP BY decile
        ),
        cum AS (
            SELECT decile, n_orders, n_pos,
                   CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT)
                       AS cum_pos,
                   CAST(SUM(n_orders) OVER (ORDER BY decile) AS BIGINT)
                       AS cum_n
            FROM per
        )
        SELECT decile, n_orders, n_pos,
               CAST(cum_pos * 1000000 // (SELECT pos_all FROM tot)
                    AS BIGINT) AS capture_ppm,
               CAST((cum_pos * 1000000 // (SELECT pos_all FROM tot))
                    * 1000000
                    // (cum_n * 1000000 // (SELECT n_all FROM tot))
                    AS BIGINT) AS lift_ppm
        FROM cum
    """,
    doc=(
        "Cumulative gains/lift deciles (score = order value, label = "
        "high priority): NTILE-10 with deterministic tiebreak, exact "
        "ppm capture share and lift per decile — the campaign-"
        "targeting curve with a bit-exact oracle."
    ),
)
def model_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one scan + one global decile rank + a 10-row rollup;
    lift arithmetic is pure integer ppm on the 10-row spine.

    The decile comes from the two-phase ``global_rank_scalable`` (r9
    verdict task 2) — NTILE(10) over a global ORDER BY is a single-
    partition window, so we re-derive the identical bucket from the
    global row number rn and total n via NTILE's exact fill rule
    (first n%10 buckets hold n DIV 10 + 1 rows, the rest n DIV 10):
    bit-identical to both engines' NTILE because (score DESC, key) is
    a total order.
    """
    from stacktrend_spark.operators.ranking import global_rank_scalable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    tot = o.agg(F.sum("y").alias("pos_all"), F.count(F.lit(1)).alias("n_all"))
    ranked = global_rank_scalable(
        o,
        order_cols=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        rank_col="rn",
    ).select("y", "rn")
    # NTILE(10) fill rule on (rn, n): GREATEST guards the q=0 branch
    # divisor (n < 10) where the CASE never reaches it anyway.
    scored = ranked.crossJoin(F.broadcast(tot)).select(
        "y",
        F.expr(
            "CASE WHEN rn <= (n_all % 10) * (n_all DIV 10 + 1)"
            " THEN 1 + (rn - 1) DIV (n_all DIV 10 + 1)"
            " ELSE 1 + (n_all % 10)"
            "  + (rn - 1 - (n_all % 10) * (n_all DIV 10 + 1))"
            "    DIV GREATEST(n_all DIV 10, 1) END"
        )
        .cast("int")
        .alias("decile"),
    )
    per = scored.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n_orders",
        "n_pos",
        F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
        F.sum("n_orders").over(wc).cast("long").alias("cum_n"),
    )
    return cum.join(F.broadcast(tot)).select(
        "decile",
        "n_orders",
        "n_pos",
        F.expr("cum_pos * 1000000 DIV pos_all").cast("long").alias("capture_ppm"),
        F.expr(
            "(cum_pos * 1000000 DIV pos_all) * 1000000"
            " DIV (cum_n * 1000000 DIV n_all)"
        )
        .cast("long")
        .alias("lift_ppm"),
    )


# ---------------------------------------------------------------------------
# Pointwise mutual information cells (r6) — completes the information-
# theory trio (entropy_kl_priority_mix: H and KL; chi2_segment_status:
# independence): PMI of every (segment × priority) cell against the
# independence product, in the same exact µlog10-integer discipline:
#
#   pmi_micro = ilog(p_ij_ppm) − ilog(pi_qj_ppm)
#   p_ij_ppm  = n_ij·10⁶ DIV N;  pi_qj_ppm = r_i·c_j·10⁶ DIV N²
#
# (r_i·c_j·10⁶ runs through DECIMAL(38,0)/HUGEINT; the ppm RESULT is
# ≤10⁶ so every ilog input is int64-safe at any corpus size). Σ n_ij ·
# pmi_micro over cells = the mutual information numerator.
# 100 TB: one custkey join shuffle → 25-cell table; marginals and N
# broadcast back — the chi2 plan shape with log-integer outputs.
# ---------------------------------------------------------------------------
@register(
    "mutual_info_pmi_cells",
    oracle=f"""
        WITH cells AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
                   CAST(COUNT(*) AS BIGINT) AS n_ij
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        rm AS (SELECT seg, SUM(n_ij) AS r FROM cells GROUP BY 1),
        cm AS (SELECT pri, SUM(n_ij) AS c FROM cells GROUP BY 1),
        tot AS (SELECT SUM(n_ij) AS n FROM cells),
        pp AS (
            SELECT cells.seg, cells.pri, cells.n_ij,
                   cells.n_ij * 1000000 // tot.n AS pij_ppm,
                   CAST(CAST(rm.r AS HUGEINT) * cm.c * 1000000
                        // (CAST(tot.n AS HUGEINT) * tot.n) AS BIGINT)
                       AS piqj_ppm
            FROM cells
            JOIN rm USING (seg) JOIN cm USING (pri) CROSS JOIN tot
        )
        SELECT seg, pri, n_ij,
               CAST(pij_ppm AS BIGINT) AS pij_ppm,
               piqj_ppm,
               CAST({{ILOG_P}} - {{ILOG_Q}} AS BIGINT) AS pmi_micro
        FROM pp
    """.replace(
        "{ILOG_P}",
        f"CAST(FLOOR({sql_xlog10('GREATEST(pij_ppm, 1)')} * 1000000.0) AS BIGINT)",
    ).replace(
        "{ILOG_Q}",
        f"CAST(FLOOR({sql_xlog10('GREATEST(piqj_ppm, 1)')} * 1000000.0) AS BIGINT)",
    ),
    doc=(
        "Pointwise mutual information of every (segment × priority) "
        "cell vs the independence product — exact µlog10 integers on "
        "ppm-quantized probabilities (wide products through 128-bit "
        "ints, ilog inputs bounded ≤10⁶ at any corpus size); "
        "Σ n_ij·pmi_micro is the MI numerator."
    ),
)
def mutual_info_pmi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.rounding import xlog10

    def ilog(col: F.Column) -> F.Column:
        return F.floor(
            xlog10(F.greatest(col, F.lit(1))) * F.lit(1000000.0)
        ).cast("long")

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ij"))
    )
    rm = cells.groupBy("seg").agg(F.sum("n_ij").alias("r"))
    cm = cells.groupBy("pri").agg(F.sum("n_ij").alias("c"))
    tot = cells.agg(F.sum("n_ij").alias("n"))
    dec = "decimal(38,0)"
    pp = (
        cells.join(F.broadcast(rm), "seg")
        .join(F.broadcast(cm), "pri")
        .join(F.broadcast(tot))
        .select(
            "seg",
            "pri",
            "n_ij",
            F.expr("n_ij * 1000000 DIV n").alias("pij_ppm"),
            F.expr(
                f"CAST(CAST(r AS {dec}) * c * 1000000"
                f" DIV (CAST(n AS {dec}) * n) AS BIGINT)"
            ).alias("piqj_ppm"),
        )
    )
    return pp.select(
        "seg",
        "pri",
        "n_ij",
        F.col("pij_ppm").cast("long"),
        "piqj_ppm",
        (ilog(F.col("pij_ppm")) - ilog(F.col("piqj_ppm"))).cast("long").alias("pmi_micro"),
    )


# ---------------------------------------------------------------------------
# Feature hashing trick (r7) — Vowpal-style categorical encoding: each
# feature string hashes to one of D buckets with a sign bit, so the
# encoder needs NO vocabulary pass, no fit state, and a fixed-width
# output — the only categorical encoding that works on an unbounded
# 100 TB feature stream. This audit materializes the bucket table for
# D=64: instance mass, distinct-feature collisions, and the signed
# mass that shows cancellation doing its job. Engine-neutral 40-bit
# md5 hashing (functions/hashing.py) keeps every bucket id and sign
# bit-identical in the oracle.
# 100 TB: a 3x map-side explode and ONE 64-row aggregate; no joins,
# no vocabulary state, nothing driver-side.
# ---------------------------------------------------------------------------
from stacktrend_spark.functions.hashing import sql_hex40  # noqa: E402

_FH_D = 64


@register(
    "feature_hashing_trick",
    oracle=f"""
        WITH feats AS (
            SELECT unnest([
                       'prio=' || o_orderpriority,
                       'status=' || o_orderstatus,
                       'px=' || o_orderpriority || '|' || o_orderstatus
                   ]) AS feat
            FROM orders
        ),
        hashed AS (
            SELECT feat,
                   ({sql_hex40('feat')}) % {_FH_D} AS bucket,
                   CASE WHEN (({sql_hex40('feat')}) // {_FH_D}) % 2 = 0
                        THEN 1 ELSE -1 END AS sign
            FROM feats
        )
        SELECT CAST(bucket AS BIGINT)                 AS bucket,
               CAST(COUNT(*) AS BIGINT)               AS n_instances,
               CAST(COUNT(DISTINCT feat) AS BIGINT)   AS n_distinct_feats,
               CAST(SUM(sign) AS BIGINT)              AS signed_mass,
               COUNT(DISTINCT feat) > 1               AS has_collision
        FROM hashed
        GROUP BY 1
    """,
    doc=(
        "Hashing-trick encoder audit (D=64, signed): per-bucket "
        "instance mass, distinct-feature collisions, and signed mass "
        "- the vocabulary-free categorical encoding for unbounded "
        "feature streams; engine-neutral 40-bit md5 buckets."
    ),
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.functions.hashing import spark_hex40

    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        F.explode(
            F.array(
                F.concat(F.lit("prio="), F.col("o_orderpriority")),
                F.concat(F.lit("status="), F.col("o_orderstatus")),
                F.concat(
                    F.lit("px="),
                    F.col("o_orderpriority"),
                    F.lit("|"),
                    F.col("o_orderstatus"),
                ),
            )
        ).alias("feat")
    )
    h = spark_hex40(F.col("feat"))
    hashed = feats.select(
        "feat",
        (h % _FH_D).alias("bucket"),
        F.when((h / _FH_D).cast("long") % 2 == 0, 1).otherwise(-1).alias("sign"),
    )
    return hashed.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_instances"),
        F.countDistinct("feat").cast("long").alias("n_distinct_feats"),
        F.sum("sign").cast("long").alias("signed_mass"),
        (F.countDistinct("feat") > 1).alias("has_collision"),
    )


# ---------------------------------------------------------------------------
# Brier score decomposition (r8) — the companion to ECE: split the
# binned Brier score into RELIABILITY (calibration error, want 0),
# RESOLUTION (how far bin outcome rates move from the base rate, want
# large) and UNCERTAINTY (base-rate variance, fixed by the data):
#     Brier = REL - RES + UNC    (Murphy 1973, exact for binned p̄_k)
# Confidence is the same exact percentile-rank ppm as model_eval_auc /
# model_calibration_ece, so the whole chain stays integer-exact: the
# three terms are Σ n_k·gap² style integer sums in ppm² units.
#
# 100 TB: identical shape to ECE — one distinct-score groupBy, the
# two-phase running sum over the score spine, a 10-row bin rollup,
# then a 1-row fold. n_k·gap² ≤ n·10¹² fits int64 through sf1000;
# beyond that the same code switches the fold to DecimalType (SCALE.md
# numeric policy).
# ---------------------------------------------------------------------------
@register(
    "brier_score_decomposition",
    oracle=f"""
        WITH e AS (
            SELECT {_AUC_SCORE_SQL} AS score,
                   CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
            FROM embeddings
        ),
        per AS (
            SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(pos) AS BIGINT) AS pos_cnt
            FROM e GROUP BY score
        ),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                     CAST(SUM(pos_cnt) AS BIGINT) AS npos FROM per),
        r AS (
            SELECT score, c, pos_cnt,
                   COALESCE(SUM(c) OVER (
                       ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS below
            FROM per
        ),
        conf AS (
            SELECT c, pos_cnt,
                   below * 1000000 // ((SELECT n FROM n) - 1) AS conf_ppm
            FROM r
        ),
        bins AS (
            SELECT LEAST(conf_ppm // 100000, 9) AS bin,
                   CAST(SUM(c) AS BIGINT)       AS nk,
                   CAST(SUM(conf_ppm * c) // SUM(c) AS BIGINT)      AS pk_ppm,
                   CAST(SUM(pos_cnt) * 1000000 // SUM(c) AS BIGINT) AS ok_ppm
            FROM conf GROUP BY 1
        ),
        base AS (
            SELECT n, CAST(npos * 1000000 // n AS BIGINT) AS base_ppm FROM n
        )
        SELECT
            b.n,
            b.base_ppm,
            CAST(b.base_ppm * (1000000 - b.base_ppm) AS BIGINT)
                AS uncertainty_ppm2,
            CAST(SUM(k.nk * (k.pk_ppm - k.ok_ppm) * (k.pk_ppm - k.ok_ppm))
                 // b.n AS BIGINT) AS reliability_ppm2,
            CAST(SUM(k.nk * (k.ok_ppm - b.base_ppm) * (k.ok_ppm - b.base_ppm))
                 // b.n AS BIGINT) AS resolution_ppm2,
            CAST(b.base_ppm * (1000000 - b.base_ppm)
                 + SUM(k.nk * (k.pk_ppm - k.ok_ppm) * (k.pk_ppm - k.ok_ppm)) // b.n
                 - SUM(k.nk * (k.ok_ppm - b.base_ppm) * (k.ok_ppm - b.base_ppm)) // b.n
                 AS BIGINT) AS brier_ppm2
        FROM bins k CROSS JOIN base b
        GROUP BY b.n, b.base_ppm
    """,
    doc=(
        "Murphy decomposition of the binned Brier score: reliability, "
        "resolution, uncertainty and their REL-RES+UNC total as exact "
        "ppm^2 integers over the same rank-calibrated 10-bin diagram "
        "as model_calibration_ece."
    ),
)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stacktrend_spark.operators.ranking import global_running_sum_scalable

    emb = load_table(spark, sf_dir, "embeddings")
    score = (
        (
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double")
        )
        + F.element_at("embedding", 3).cast("double")
    ) + F.element_at("embedding", 4).cast("double")
    pos = F.when(F.col("label") < 5, 1).otherwise(0)
    per = (
        emb.select(score.alias("score"), pos.alias("pos"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("pos").alias("pos_cnt"))
    )
    rs = global_running_sum_scalable(
        per, [F.col("score")], "c", sum_col="cum_incl", num_partitions=8
    )
    nn = per.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("pos_cnt").cast("long").alias("npos"),
    )
    conf = rs.join(F.broadcast(nn)).select(
        "c",
        "pos_cnt",
        # r13 degenerate-corpus fix: a 1-score corpus has n - 1 = 0 —
            # ANSI Spark crashed where DuckDB yields NULL conf (LEAST
            # then drops the NULL and the row lands in bin 9 on both)
            F.expr(
                "CASE WHEN n = 1 THEN NULL"
                " ELSE (cum_incl - c) * 1000000 DIV (n - 1) END"
            ).alias("conf_ppm"),
    )
    bins = (
        conf.groupBy(F.least(F.expr("conf_ppm DIV 100000"), F.lit(9)).alias("bin"))
        .agg(
            F.sum("c").cast("long").alias("nk"),
            F.expr("CAST(SUM(conf_ppm * c) DIV SUM(c) AS BIGINT)").alias("pk_ppm"),
            F.expr("CAST(SUM(pos_cnt) * 1000000 DIV SUM(c) AS BIGINT)").alias(
                "ok_ppm"
            ),
        )
    )
    base = nn.select(
        "n", F.expr("CAST(npos * 1000000 DIV n AS BIGINT)").alias("base_ppm")
    )
    return (
        bins.join(F.broadcast(base))
        .groupBy("n", "base_ppm")
        .agg(
            F.expr(
                "CAST(SUM(nk * (pk_ppm - ok_ppm) * (pk_ppm - ok_ppm)) DIV MAX(n)"
                " AS BIGINT)"
            ).alias("rel"),
            F.expr(
                "CAST(SUM(nk * (ok_ppm - base_ppm) * (ok_ppm - base_ppm)) DIV MAX(n)"
                " AS BIGINT)"
            ).alias("res"),
        )
        .select(
            "n",
            "base_ppm",
            F.expr("CAST(base_ppm * (1000000 - base_ppm) AS BIGINT)").alias(
                "uncertainty_ppm2"
            ),
            F.col("rel").alias("reliability_ppm2"),
            F.col("res").alias("resolution_ppm2"),
            F.expr(
                "CAST(base_ppm * (1000000 - base_ppm) + rel - res AS BIGINT)"
            ).alias("brier_ppm2"),
        )
    )
