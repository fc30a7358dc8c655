"""Similarity search over embedding columns (array<float>).

Beyond-reference north-star capability (BASELINE.json): approximate
nearest neighbor over an embedding column.

- **brute-force cosine top-k** — the exact baseline. Queries are tiny
  (top-k per a handful of probes) → broadcast them; candidates stream
  through a codegen'd zip_with/aggregate dot product; per-query top-k
  via partitioned row_number so no global sort.
- **bucketed (IVF-style) top-k** — the scale path: restrict candidates
  to the probe's coarse partition (here the testdata's ``label`` column
  stands in for a k-means cell id). Candidate volume drops by the
  bucket fan-out; the join becomes an equi-join on bucket id, which at
  100 TB turns an O(Q·N) scan into O(Q·N/cells) with
  partition-pruned reads if the table is written partitioned by cell.

All arithmetic is float→double cast then sequential sum — verified
bit-identical with DuckDB's list_dot_product, which is what makes these
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import fround


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-order dot product of two float arrays in double.

    With ``dim`` known (fixed-width embeddings — the common case) the
    sum is UNROLLED into plain arithmetic: element_at/multiply/add are
    all whole-stage-codegen'd, unlike the interpreted higher-order
    ``aggregate``/``zip_with`` path (~4× slower per pair). Left-fold
    order is identical in both forms (and to DuckDB's
    list_dot_product), so results are bit-equal."""
    if dim is not None:
        terms = [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        return F.sqrt(dot(a, a, dim))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# Random-hyperplane (sign) LSH — the second ANN scale path alongside
# IVF. Hyperplanes are DERIVED, not random: component (p, j) comes from
# an LCG over the flat index, divided by 2^31 (a dyadic division —
# exact in doubles) and centered. Both engines can therefore rebuild
# the exact same planes, which is what makes an LSH ANN oracle-checkable.
# ---------------------------------------------------------------------------


def lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5)^dim:
    component = ((1103515245·i + 12345) mod 2^31) / 2^31 − 0.5 over the
    flat index i = p·dim + j (the classic glibc LCG constants). Every
    value is a dyadic rational → bit-exact as a double literal in any
    engine."""
    return [
        [
            ((1103515245 * (p * dim + j) + 12345) % (1 << 31)) / float(1 << 31) - 0.5
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]], dim: int) -> Column:
    """Signed-projection bucket id: bit p = (vec · plane_p >= 0),
    bucket = Σ 2^p · bit_p. Zero shuffle — the signature is computed in
    the same map as the scan. Plane dots deliberately use the compact
    fold form (``dim=None``), not the unrolled form: n_planes × dim
    unrolled terms bloat the generated code past the JIT's comfort
    (~MB task binaries, seconds of compile) while the fold's per-row
    interpreted cost is negligible next to the candidate-join rerank.
    Left-fold order matches the unrolled chain and DuckDB's
    list_dot_product, so signatures stay bit-identical (see ``dot``)."""
    acc: Column | None = None
    for p, w in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in w])
        bit = F.when(dot(vec, lit_plane) >= 0.0, F.lit(1 << p)).otherwise(F.lit(0))
        acc = bit if acc is None else acc + bit
    return acc.cast("long")


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    round_decimals: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    ``queries`` must carry (id_col, vec_col) [+ bucket_col]; it is
    broadcast. With ``bucket_col`` the candidate set is restricted to
    the query's bucket (IVF-style coarse quantization); without, the
    full corpus is scanned (brute force). Pass ``dim`` for fixed-width
    embeddings to get the unrolled codegen'd dot product (see ``dot``).

    Ranking is on the ROUNDED similarity with the candidate id as
    tiebreaker, so the selected k-set is deterministic.
    Returns (query_id, neighbor_id, cosine_sim, sim_rank).
    """
    # With dim known, the vectors are kept as the STORED float arrays
    # and every term does element_at(col, i).cast(double): a projected
    # pre-cast array would be inlined back into the pair expression by
    # CollapseProject, re-evaluating the O(dim) transform once per
    # unrolled term (O(dim²) per pair). Norms are still computed once
    # per side before the join.
    vec_expr = (
        F.col(vec_col)
        if dim is not None
        else F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec_expr.alias("q_vec"),
        norm(F.col(vec_col), dim).alias("q_norm"),
        *([F.col(bucket_col).alias("q_bucket")] if bucket_col else []),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        vec_expr.alias("c_vec"),
        norm(F.col(vec_col), dim).alias("c_norm"),
        *([F.col(bucket_col).alias("c_bucket")] if bucket_col else []),
    )
    if bucket_col:
        joined = c.join(F.broadcast(q), F.col("q_bucket") == F.col("c_bucket"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    if dim is not None:
        terms = [
            F.element_at(F.col("q_vec"), i).cast("double")
            * F.element_at(F.col("c_vec"), i).cast("double")
            for i in range(1, dim + 1)
        ]
        raw_dot = terms[0]
        for t in terms[1:]:
            raw_dot = raw_dot + t
    else:
        raw_dot = F.aggregate(
            F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        fround(raw_dot / (F.col("q_norm") * F.col("c_norm")), round_decimals).alias(
            "cosine_sim"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("sim_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sim_rank") <= k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    round_decimals: int = 6,
    dim: int | None = None,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs
    inside the same coarse bucket with cosine >= threshold.

    The bucket equi-join is the scale lever: pair volume is
    sum(bucket²) instead of N², and with the table written partitioned
    by bucket the join is co-located (no shuffle of the big side). At
    100 TB the bucket id comes from a k-means/LSH assignment upstream;
    here the testdata's ``label`` plays that role.

    ``max_bucket_rows`` arms the HOT-BUCKET GUARD (operators/skew.py
    rationale): a plain self-join sends each whole bucket to one task,
    so one viral bucket serializes the stage. When a bucket holds more
    than ``max_bucket_rows`` rows it is split into g =
    ceil(rows/max_bucket_rows) deterministic chunks (hash of id), and
    the self-join becomes a TRIANGLE GRID over chunk cells: a row in
    chunk c joins as the left side of cells (c, c..g-1) and as the
    right side of cells (0..c, c), so every unordered chunk pair meets
    in exactly one cell and each cell is an independent join task of
    ~(rows/g)² pair volume. Cold buckets get g = 1 and degenerate to
    the plain path; results are row-identical either way.
    Returns (id_a, id_b, cosine_sim).
    """
    # stored-array unroll with per-element casts when dim is known —
    # see cosine_topk for why a pre-cast array is a pessimization
    vec_expr = (
        F.col(vec_col)
        if dim is not None
        else F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    sides = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(bucket_col).alias("bucket"),
        vec_expr.alias("vec"),
        norm(F.col(vec_col), dim).alias("nrm"),
    )
    join_keys = ["bucket"]
    if max_bucket_rows is not None:
        # per-bucket split factor from a (tiny, broadcast) count table
        counts = (
            embeddings.groupBy(F.col(bucket_col).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("_bn"))
            .select(
                "bucket",
                F.greatest(
                    F.lit(1), F.ceil(F.col("_bn") / F.lit(max_bucket_rows))
                )
                .cast("int")
                .alias("_g"),
            )
        )
        sides = sides.join(F.broadcast(counts), "bucket").withColumn(
            "_c", F.pmod(F.hash(F.col("id")), F.col("_g"))
        )
        join_keys = ["bucket", "_cx", "_cy"]
        a = sides.select(
            F.col("id").alias("id_a"), "bucket",
            F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a"),
            F.col("_c").alias("_cx"),
            F.explode(F.sequence(F.col("_c"), F.col("_g") - 1)).alias("_cy"),
        )
        b = sides.select(
            F.col("id").alias("id_b"), "bucket",
            F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b"),
            F.explode(F.sequence(F.lit(0), F.col("_c"))).alias("_cx"),
            F.col("_c").alias("_cy"),
        )
    else:
        a = sides.select(
            F.col("id").alias("id_a"), "bucket",
            F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a"),
        )
        b = sides.select(
            F.col("id").alias("id_b"), "bucket",
            F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b"),
        )
    if dim is not None:
        terms = [
            F.element_at(F.col("vec_a"), i).cast("double")
            * F.element_at(F.col("vec_b"), i).cast("double")
            for i in range(1, dim + 1)
        ]
        raw_dot = terms[0]
        for t in terms[1:]:
            raw_dot = raw_dot + t
    else:
        raw_dot = F.aggregate(
            F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    sim = fround(raw_dot / (F.col("nrm_a") * F.col("nrm_b")), round_decimals)
    joined = a.join(b, join_keys)
    if max_bucket_rows is not None:
        # diagonal cells (cx == cy) see each unordered pair twice →
        # orient by id; off-diagonal cells see it exactly once but in
        # arbitrary id order (left side = lower chunk, not lower id) →
        # keep both orders' single occurrence and normalize below
        joined = joined.filter(
            (F.col("_cx") != F.col("_cy")) | (F.col("id_a") < F.col("id_b"))
        )
        out_a = F.least("id_a", "id_b").alias("id_a")
        out_b = F.greatest("id_a", "id_b").alias("id_b")
    else:
        joined = joined.filter(F.col("id_a") < F.col("id_b"))
        out_a, out_b = F.col("id_a").alias("id_a"), F.col("id_b").alias("id_b")
    return (
        joined.select(out_a, out_b, sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
