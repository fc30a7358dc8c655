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

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StructType

from stacktrend_spark.functions.rounding import fround


# ---------------------------------------------------------------------------
# Arrow-batched pair scoring (r5). The r4 `dim`-unrolled codegen dot
# (64 element_at·cast·multiply terms chained per pair) was MEASURED to
# pay an MB-scale serialized-task + seconds-of-Catalyst fixed cost per
# query (BENCH_FULL r4: repeated "broadcasting large task binary
# 1.2–1.7 MiB" warnings; pipeline_semdedup 10.25 s dominated by it).
# Pair scoring now crosses into numpy via mapInArrow: the closure is a
# constant few-hundred-byte kernel regardless of dim, and the per-pair
# arithmetic is vectorized over Arrow batches (SIMD columnar loops —
# faster per pair than interpreted Catalyst folds AND than the unrolled
# codegen for wide dims).
#
# Parity: the kernel reproduces the exact left-fold summation order of
# the column-expression forms and DuckDB's list_dot_product —
# `acc = a₁b₁; acc = acc + aⱼbⱼ` per element, float32→float64 casts
# exact, products/sums correctly-rounded IEEE doubles — so results are
# bit-identical to the r1–r4 hashed surfaces (rounding stays on the
# Catalyst side via `fround`).
# ---------------------------------------------------------------------------


def _np_mat(batch: pa.RecordBatch, name: str, dim: int) -> np.ndarray:
    """(n, dim) float64 matrix from a fixed-width list<float> column."""
    col = batch.column(batch.schema.get_field_index(name))
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(len(col), dim)


def _seq_dot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot in the exact left-fold element order (see above)."""
    acc = A[:, 0] * B[:, 0]
    for j in range(1, A.shape[1]):
        acc = acc + A[:, j] * B[:, j]
    return acc


def pairwise_cosine_arrow(
    pairs: DataFrame, vec_a: str, vec_b: str, dim: int, out: str = "cosine_raw"
) -> DataFrame:
    """Append the raw (unrounded) cosine of two fixed-width vector
    columns as ``out`` and DROP the vector columns — the Arrow-kernel
    replacement for the unrolled pair dot. Norms are recomputed per
    pair (vectorized ~2·dim flops — cheaper at any scale than carrying
    per-side norm columns through the join was in codegen)."""
    keep = [f.name for f in pairs.schema.fields if f.name not in (vec_a, vec_b)]
    schema = StructType(
        [f for f in pairs.schema.fields if f.name in keep]
    ).add(out, DoubleType())

    def kernel(batches):
        for b in batches:
            A = _np_mat(b, vec_a, dim)
            Bm = _np_mat(b, vec_b, dim)
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = _seq_dot(A, Bm) / (
                    np.sqrt(_seq_dot(A, A)) * np.sqrt(_seq_dot(Bm, Bm))
                )
            arrays = [
                b.column(b.schema.get_field_index(n)) for n in keep
            ] + [pa.array(sim, type=pa.float64())]
            yield pa.RecordBatch.from_arrays(arrays, keep + [out])

    return pairs.mapInArrow(kernel, schema)


def _prep_centroids(
    centroids: list[tuple[int, list[float]]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cids, C, cc): cid-sorted centroid ids, matrix, and per-centroid
    self-dots in the pinned left-fold order — the shared closure state
    of rank_cells_arrow / with_cell_arrow (extracted r9; the r8 review
    flagged the duplication)."""
    cents = sorted(centroids, key=lambda t: t[0])
    if not cents:
        # r13 empty-corpus fix: an empty centroid list produced a
        # 1-dim empty ndarray and _seq_dot's 2-dim indexing raised on
        # the driver. A (0, 1) matrix keeps every downstream dot /
        # argmin shape-correct — zero data rows rank against zero
        # centroids into the correct empty result.
        return (
            np.array([], dtype=np.int64),
            np.zeros((0, 1), dtype=np.float64),
            np.array([], dtype=np.float64),
        )
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)
    return cids, C, _seq_dot(C, C)


def _centroid_dist2(A: np.ndarray, C: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """(n, k) squared-L2 matrix in the PINNED parity op order:
    d2[:, j] = (⟨a,a⟩ + ⟨c_j,c_j⟩) − 2·⟨a,c_j⟩, every dot sequential
    left-fold (_seq_dot) — bit-identical to the DuckDB oracle's
    list_dot_product form. Any change here moves hashed surfaces."""
    aa = _seq_dot(A, A)
    d2 = np.empty((len(A), len(cc)), dtype=np.float64)
    for j in range(len(cc)):
        ac = _seq_dot(A, np.broadcast_to(C[j], A.shape))
        d2[:, j] = (aa + cc[j]) - 2.0 * ac
    return d2


def rank_cells_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, rn): every vector's centroids ordered by squared-L2
    distance — rn=1 is the Lloyd assignment, rn<=nprobe the IVF probe
    set. Emits K rows per input row.

    Centroids arrive as a COLLECTED list (the broadcast-centroids
    pattern: K·dim floats ship in the task closure — K up to thousands
    stays tiny, and the corpus never joins or fans out; the r4 form
    cross-joined a broadcast centroid table and paid a 3×dim-term
    unrolled codegen chain per pair, MB-scale task binaries).

    Parity (pinned vs the DuckDB oracle's CROSS JOIN form):
    dist² = (⟨a,a⟩ + ⟨c,c⟩) − 2·⟨a,c⟩ with every dot in sequential
    left-fold order (_seq_dot) — bit-identical IEEE doubles — and ties
    broken by ascending cid via a stable argsort over cid-ordered
    columns, matching ORDER BY dist2, cid.
    """
    cids, C, cc = _prep_centroids(centroids)
    k = len(cids)
    schema = StructType(
        [f for f in df.schema.fields if f.name == id_col]
    ).add("cid", LongType()).add("rn", IntegerType())

    def kernel(batches):
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col))
            A = _np_mat(b, vec_col, dim)
            n = len(A)
            d2 = _centroid_dist2(A, C, cc)
            order = np.argsort(d2, axis=1, kind="stable")  # ties → lower cid
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids.to_numpy(zero_copy_only=False), k)),
                    pa.array(cids[order].reshape(-1), type=pa.int64()),
                    pa.array(
                        np.tile(np.arange(1, k + 1, dtype=np.int32), n),
                        type=pa.int32(),
                    ),
                ],
                [id_col, "cid", "rn"],
            )

    return df.select(id_col, vec_col).mapInArrow(kernel, schema)


def with_cell_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    dim: int,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """All input columns + the Lloyd-assigned nearest-centroid id
    (argmin over squared L2, ties to the lower cid) — the map-only
    fused form of ``rank_cells_arrow`` for consumers that need the
    assigned ROWS, not the ranking: it replaces the
    ``df.join(assignment, id)`` round-trip (a full shuffle of the
    corpus both sides) with zero extra stages. Same dist² parity
    contract as rank_cells_arrow."""
    cids, C, cc = _prep_centroids(centroids)
    names = [f.name for f in df.schema.fields]
    schema = StructType(list(df.schema.fields)).add(out_col, LongType())

    def kernel(batches):
        for b in batches:
            A = _np_mat(b, vec_col, dim)
            d2 = _centroid_dist2(A, C, cc)
            # stable argmin == rank-1 of (dist2, cid): first minimal
            # column index over cid-ordered columns
            best = cids[np.argmin(d2, axis=1)]
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(b.num_columns)]
                + [pa.array(best, type=pa.int64())],
                names + [out_col],
            )

    return df.mapInArrow(kernel, schema)


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
    # dim known (fixed-width embeddings, the common case): ship the
    # stored float arrays through the join untouched and score the
    # surviving pairs in the Arrow kernel (see pairwise_cosine_arrow —
    # bit-identical to the fold, without the r4 codegen fixed cost).
    vec_expr = (
        F.col(vec_col)
        if dim is not None
        else F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec_expr.alias("q_vec"),
        *([] if dim is not None else [norm(F.col(vec_col), dim).alias("q_norm")]),
        *([F.col(bucket_col).alias("q_bucket")] if bucket_col else []),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        vec_expr.alias("c_vec"),
        *([] if dim is not None else [norm(F.col(vec_col), dim).alias("c_norm")]),
        *([F.col(bucket_col).alias("c_bucket")] if bucket_col else []),
    )
    if bucket_col:
        joined = c.join(F.broadcast(q), F.col("q_bucket") == F.col("c_bucket"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    if dim is not None:
        scored = pairwise_cosine_arrow(joined, "q_vec", "c_vec", dim).select(
            "query_id",
            "neighbor_id",
            fround(F.col("cosine_raw"), round_decimals).alias("cosine_sim"),
        )
    else:
        raw_dot = F.aggregate(
            F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = joined.select(
            "query_id",
            "neighbor_id",
            fround(
                raw_dot / (F.col("q_norm") * F.col("c_norm")), round_decimals
            ).alias("cosine_sim"),
        )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("sim_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sim_rank") <= k)
    )


def _bucket_chunk_factors(
    embeddings: DataFrame, bucket_col: str, max_bucket_rows: int
) -> DataFrame:
    """(bucket, _g): the hot-bucket split factor table — g =
    ceil(bucket_rows / max_bucket_rows), 1 for cold buckets. Tiny
    (one row per bucket) and broadcast by callers; shared by the
    join-path and grouped-kernel near-dup plans (extracted r9; the r8
    review flagged the duplication)."""
    return (
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


def _with_chunk(sides: DataFrame, counts: DataFrame) -> DataFrame:
    """sides + (_g, _c): join the broadcast split-factor table and
    assign each row its deterministic chunk (hash of id mod g)."""
    return sides.join(F.broadcast(counts), "bucket").withColumn(
        "_c", F.pmod(F.hash(F.col("id")), F.col("_g"))
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
    rationale): a whole bucket lands in one task, so one viral bucket
    serializes the stage. When a bucket holds more than
    ``max_bucket_rows`` rows it is split into g =
    ceil(rows/max_bucket_rows) deterministic chunks (hash of id), and
    the pairing becomes a TRIANGLE GRID over chunk cells: a row in
    chunk c is the A-side of cells (c, c..g-1) and the B-side of cells
    (0..c-1, c), so every unordered chunk pair meets in exactly one
    cell and each cell is an independent task of ~(rows/g)² pair
    volume. Cold buckets get g = 1 and degenerate to the plain path;
    results are row-identical either way.
    Returns (id_a, id_b, cosine_sim).

    With ``dim`` set (fixed-width embeddings) pairs are generated and
    scored INSIDE a grouped Arrow kernel (one applyInPandas over the
    (bucket, cell) groups): each vector crosses the shuffle + Python
    boundary ONCE PER CELL (O(N·g) rows), and only surviving pairs come
    back. r4's join-then-score form materialized both vectors per
    CANDIDATE pair (O(Σbucket²) rows × 2·dim floats) — MEASURED at
    sf0.1 that was 9.5 s of join/transfer for 152 surviving pairs
    (semdedup); the grouped kernel does the same arithmetic in-place.
    Without ``dim`` the join + interpreted-fold path remains (arbitrary
    variable-width arrays).
    """
    if dim is not None:
        return _near_dup_pairs_grouped(
            embeddings, threshold, id_col, vec_col, bucket_col,
            round_decimals, dim, max_bucket_rows,
        )
    sides = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(bucket_col).alias("bucket"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        norm(F.col(vec_col), None).alias("nrm"),
    )
    join_keys = ["bucket"]
    if max_bucket_rows is not None:
        # per-bucket split factor from a (tiny, broadcast) count table
        sides = _with_chunk(
            sides, _bucket_chunk_factors(embeddings, bucket_col, max_bucket_rows)
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
    raw_dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = fround(raw_dot / (F.col("nrm_a") * F.col("nrm_b")), round_decimals)
    return (
        joined.select(out_a, out_b, sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


#: A-side row block for the in-kernel pair matrix: bounds kernel memory
#: at BLOCK·max_bucket_rows·8 B per accumulator regardless of cell size.
_PAIR_BLOCK = 1024


def _near_dup_pairs_grouped(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    round_decimals: int,
    dim: int,
    max_bucket_rows: int | None,
) -> DataFrame:
    """Grouped-kernel near-dup pairing (see cosine_near_dup_pairs).

    Cell layout: a row in chunk c ships with role A into cells
    (c, c..g-1) — the diagonal cell (c, c) carries role A only and the
    kernel emits its strict upper triangle in id order — and with role
    B into cells (0..c-1, c). g = 1 (no guard / cold bucket) degenerates
    to one diagonal cell per bucket. The kernel scores each A-block ×
    B matrix with the exact left-fold element order of _seq_dot, rounds
    via the shared floor(x·10ⁿ + 0.5)/10ⁿ formula (bit-identical to the
    Catalyst/DuckDB forms), and emits only pairs ≥ threshold.
    """
    import pandas as pd

    sides = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(bucket_col).alias("bucket"),
        F.col(vec_col).alias("vec"),
    )
    if max_bucket_rows is not None:
        chunked = _with_chunk(
            sides, _bucket_chunk_factors(embeddings, bucket_col, max_bucket_rows)
        )
        a = chunked.select(
            "id", "bucket", "vec",
            F.col("_c").alias("_cx"),
            F.explode(F.sequence(F.col("_c"), F.col("_g") - 1)).alias("_cy"),
            F.lit(0).alias("_role"),
        )
        b = chunked.filter(F.col("_c") > 0).select(
            "id", "bucket", "vec",
            F.explode(F.sequence(F.lit(0), F.col("_c") - 1)).alias("_cx"),
            F.col("_c").alias("_cy"),
            F.lit(1).alias("_role"),
        )
        cells = a.unionByName(b)
    else:
        cells = sides.select(
            "id", "bucket", "vec",
            F.lit(0).alias("_cx"), F.lit(0).alias("_cy"),
            F.lit(0).alias("_role"),
        )

    k = float(10**round_decimals)
    thr = float(threshold)
    id_type = dict(zip(sides.schema.names, sides.schema.fields))["id"].dataType
    out_schema = (
        StructType().add("id_a", id_type).add("id_b", id_type)
        .add("cosine_sim", DoubleType())
    )

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id_a": pd.array([], dtype="int64"),
             "id_b": pd.array([], dtype="int64"),
             "cosine_sim": pd.array([], dtype="float64")}
        )
        diag = bool(pdf["_cx"].iat[0] == pdf["_cy"].iat[0])
        if diag:
            sub = pdf.sort_values("id")
            ids_a = ids_b = sub["id"].to_numpy()
            if len(ids_a) < 2:
                return empty
            A = Bm = np.stack(sub["vec"].to_numpy()).astype(np.float64)
        else:
            sub_a = pdf[pdf["_role"] == 0]
            sub_b = pdf[pdf["_role"] == 1]
            if len(sub_a) == 0 or len(sub_b) == 0:
                return empty
            ids_a = sub_a["id"].to_numpy()
            ids_b = sub_b["id"].to_numpy()
            A = np.stack(sub_a["vec"].to_numpy()).astype(np.float64)
            Bm = np.stack(sub_b["vec"].to_numpy()).astype(np.float64)
        nb = np.sqrt(_seq_dot(Bm, Bm))
        oa, ob, os_ = [], [], []
        for s in range(0, len(A), _PAIR_BLOCK):
            Ab = A[s : s + _PAIR_BLOCK]
            acc = np.multiply.outer(Ab[:, 0], Bm[:, 0])
            for j in range(1, dim):
                acc = acc + np.multiply.outer(Ab[:, j], Bm[:, j])
            na = np.sqrt(_seq_dot(Ab, Ab))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.floor((acc / np.outer(na, nb)) * k + 0.5) / k
            mask = sims >= thr
            if diag:
                # strict upper triangle in id order (rows sorted by id)
                cols = np.arange(len(ids_b))
                mask &= cols[None, :] > (s + np.arange(len(Ab)))[:, None]
            bi, bj = np.nonzero(mask)
            if len(bi):
                ia, ib = ids_a[s + bi], ids_b[bj]
                oa.append(np.minimum(ia, ib))
                ob.append(np.maximum(ia, ib))
                os_.append(sims[bi, bj])
        if not oa:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(oa), "id_b": np.concatenate(ob),
             "cosine_sim": np.concatenate(os_)}
        )

    return cells.groupBy("bucket", "_cx", "_cy").applyInPandas(score, out_schema)
