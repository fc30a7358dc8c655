"""K-means Lloyd assignment: training the IVF coarse quantizer.

``sim_ivf_topk`` (plans/northstar.py) prunes ANN candidates by coarse
cell; this module supplies the missing training half — the Lloyd
assignment step that builds those cells. Each vector is assigned to its
nearest of K centroids by squared L2 distance.

Parity: dist² = ⟨a,a⟩ + ⟨c,c⟩ − 2⟨a,c⟩ from three left-fold dot
products (``operators/similarity.dot`` ≡ DuckDB ``list_dot_product``,
bit-identical — PARITY.md), combined with exactly-rounded IEEE +/−/×,
so both engines rank centroids on bit-identical distances; the
(dist², centroid-id) ordering breaks any exact tie identically. The
hashed surface itself is integer-only.

100 TB notes: K centroids broadcast to every task — the K-fold
candidate amplification is map-side and never shuffles the corpus; the
per-vector argmin is a fixed-size struct min, and the only Exchange is
the groupBy on vec_id. A full Lloyd ITERATION (recompute centroids)
sums per-dimension components — order-dependent in floats, so a
production loop would sum scaled ints (the iscale pattern) per
dimension; assignment alone needs no such care.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stacktrend_spark.operators.similarity import dot
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

_K = 8  # centroid count: vec_id < _K seeds the quantizer deterministically

_SQL_D = "list_transform({0}, x -> CAST(x AS DOUBLE))"


@register(
    "kmeans_assign_cells",
    oracle=f"""
        WITH cent AS (
            SELECT vec_id AS cid, {_SQL_D.format("embedding")} AS cvec
            FROM embeddings WHERE vec_id < {_K}
        ),
        pts AS (
            SELECT vec_id, {_SQL_D.format("embedding")} AS v FROM embeddings
        ),
        d AS (
            SELECT p.vec_id, c.cid,
                   list_dot_product(p.v, p.v) + list_dot_product(c.cvec, c.cvec)
                     - 2 * list_dot_product(p.v, c.cvec) AS dist2
            FROM pts p CROSS JOIN cent c
        ),
        r AS (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
            FROM d
        )
        SELECT vec_id,
               CAST(cid AS BIGINT)                             AS cell,
               CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS cell_size
        FROM r WHERE rn = 1
    """,
    doc=(
        f"Lloyd assignment to {_K} broadcast centroids by squared L2 — "
        "the IVF coarse-quantizer training step; integer-only hashed surface."
    ),
)
def kmeans_assign_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return _assignment(emb).select(
        "vec_id",
        F.col("cid").cast("long").alias("cell"),
        F.count(F.lit(1)).over(W.partitionBy("cid")).cast("long").alias("cell_size"),
    )


def _assignment(emb: DataFrame) -> DataFrame:
    """(vec_id, cell) for every vector — the argmin over broadcast centroids."""
    cent = emb.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    d = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        (
            dot(F.col("embedding"), F.col("embedding"))
            + dot(F.col("cvec"), F.col("cvec"))
            - F.lit(2) * dot(F.col("embedding"), F.col("cvec"))
        ).alias("dist2"),
    )
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cid"))
    )
    return d.withColumn("rn", rn).filter(F.col("rn") == 1).select("vec_id", "cid")


@register(
    "kmeans_recompute_centroids",
    # components are quantized to 1e-6 BEFORE summing (floor(x·1e6+0.5),
    # the iscale pattern): integer sums are order-independent, so the
    # recomputed centroid is bit-identical across engines — the float
    # pitfall a naive AVG(component) would hit (partial-agg order).
    oracle=f"""
        WITH cent AS (
            SELECT vec_id AS cid, {_SQL_D.format("embedding")} AS cvec
            FROM embeddings WHERE vec_id < {_K}
        ),
        pts AS (
            SELECT vec_id, {_SQL_D.format("embedding")} AS v FROM embeddings
        ),
        d AS (
            SELECT p.vec_id, p.v, c.cid,
                   list_dot_product(p.v, p.v) + list_dot_product(c.cvec, c.cvec)
                     - 2 * list_dot_product(p.v, c.cvec) AS dist2
            FROM pts p CROSS JOIN cent c
        ),
        assigned AS (
            SELECT vec_id, v, cid FROM (
                SELECT vec_id, v, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
                FROM d
            ) WHERE rn = 1
        ),
        comps AS (
            SELECT cid, unnest(generate_series(1, 64)) AS dim, v
            FROM assigned
        )
        SELECT
            CAST(cid AS BIGINT)  AS cell,
            CAST(dim AS BIGINT)  AS dim,
            CAST(COUNT(*) AS BIGINT) AS n_members,
            CAST(SUM(CAST(FLOOR(v[dim] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                                 AS sum_scaled,
            CAST(SUM(CAST(FLOOR(v[dim] * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                / (1000000.0 * COUNT(*)) AS centroid_val
        FROM comps
        GROUP BY 1, 2
    """,
    doc=(
        "Lloyd centroid recompute with exact scaled-int component sums "
        "(order-independent, engine-identical) — the full k-means step."
    ),
)
def kmeans_recompute_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _assignment(emb).join(emb, "vec_id")
    comps = assigned.select(
        F.col("cid"),
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "cid",
        (F.col("dim0") + 1).alias("dim"),  # 1-based to match the SQL side
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("xs"),
    )
    return comps.groupBy("cid", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("xs").cast("long").alias("sum_scaled"),
    ).select(
        F.col("cid").cast("long").alias("cell"),
        F.col("dim").cast("long").alias("dim"),
        "n_members",
        "sum_scaled",
        (
            F.col("sum_scaled").cast("double")
            / (F.lit(1000000.0) * F.col("n_members"))
        ).alias("centroid_val"),
    )
