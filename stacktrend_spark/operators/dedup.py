"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (its only dedup is a driver-side seen-set,
github_data_ingestion.py:199-219, replaced here by distributed ops —
SURVEY §2.4 A12 ⟲). Four families, all expressed as shuffle-conscious
DataFrame transforms:

- **exact dedup**: hash-groupBy on a normalization key. One shuffle on
  the 16-byte digest; at 100 TB this is the cheapest possible dedup
  (shuffle carries only (digest, id)).
- **MinHash + LSH**: word-shingles → k lexicographic-min digests →
  banded signatures → candidate pairs via equi-join on band keys →
  exact-Jaccard verification of candidates only. The join is on band
  digests (uniform, no skew); candidate verification touches only the
  (tiny) candidate set, never the full N² space.
- **SimHash**: per-token digest-nibble bit votes aggregated per doc →
  64 docs collapse to one 32-bit signature; near-dup candidates can
  then band on signature bytes.
- **n-gram Jaccard**: exact pairwise similarity via a shingle-posting
  join — the quadratic baseline used to verify the sketch-based paths.

Hash function: every digest is md5-of-string (salted by prefixing
``"{salt}|"``), because md5 is bit-identical everywhere (JVM, DuckDB,
Python) — which makes these sketches *oracle-checkable*, unlike
xxhash64/murmur whose implementations differ per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) posting list of word n-grams (lowercased).

    Built with array higher-order functions (whole-stage codegen'd) —
    no Python UDF: split → transform(sequence) → explode.
    """
    w = F.split(F.lower(F.col(text_col)), " ")
    joined = ", ' ', ".join(f"w[i + {j}]" for j in range(n))
    shingle_expr = f"transform(sequence(0, size(w) - {n}), i -> concat({joined}))"
    if distinct:
        # dedup inside the array BEFORE exploding: per-doc distinct is
        # equivalent to a global (id, shingle) distinct but needs no
        # shuffle — array_distinct runs in the same narrow stage
        shingle_expr = f"array_distinct({shingle_expr})"
    return (
        df.select(F.col(id_col), w.alias("w"))
        .filter(F.size("w") >= n)
        .select(F.col(id_col), F.explode(F.expr(shingle_expr)).alias("shingle"))
    )


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles: array<string>, n_shingles) — the NARROW form of the
    posting list: distinct word n-grams kept as one array per doc, no
    explode, no shuffle. Signatures, sizes and candidate verification
    can all be computed from this without ever materializing the
    exploded (id, shingle) rows; at 100 TB that removes a full
    shuffle+explode of ~50× the corpus size from the minhash path."""
    w = F.split(F.lower(F.col(text_col)), " ")
    joined = ", ' ', ".join(f"w[i + {j}]" for j in range(n))
    arr = f"array_distinct(transform(sequence(0, size(w) - {n}), i -> concat({joined})))"
    return (
        df.select(F.col(id_col), w.alias("w"))
        .filter(F.size("w") >= n)
        .select(F.col(id_col), F.expr(arr).alias("shingles"))
        .withColumn("n_shingles", F.size("shingles").cast("long"))
    )


def minhash_signatures_from_arrays(
    arr_df: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """k min-digests per id from the array-form shingle list — a pure
    projection (``array_min`` over salted md5s): no explode, no groupBy,
    ZERO shuffles. Identical values to ``minhash_signatures``."""
    # NB: factory, not `lambda s, i=i`: pyspark reads a 2-param lambda
    # as an (element, index) function and would bind i to the index col
    def salted(salt: str):
        return lambda s: F.md5(F.concat(F.lit(salt), s))

    sig_cols = [
        F.array_min(F.transform(F.col("shingles"), salted(f"{i}|"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return arr_df.select(F.col(id_col), *sig_cols)


def jaccard_from_arrays(
    arr_df: DataFrame, id_col: str, pairs: DataFrame, broadcast_pairs: bool = True
) -> DataFrame:
    """Exact Jaccard for a candidate pair set, computed directly on the
    array form: join the pair list against the corpus twice, then
    ``n_common = size(array_intersect(a, b))`` per pair — no
    posting-list explode, no groupBy. With ``broadcast_pairs`` (the
    default, for genuinely tiny candidate sets) the big side is never
    shuffled: both joins broadcast the candidates. For candidate sets
    that grow with the corpus — e.g. the bounded star edges, O(N·bands)
    rows — pass ``broadcast_pairs=False``: the joins become shuffle
    joins on id (linear, AQE may still pick broadcast at small sf), so
    nothing driver-side ever holds O(N). Returns
    (id_a, id_b, n_common, n_a, n_b)."""
    hint = F.broadcast if broadcast_pairs else (lambda df: df)
    a = arr_df.select(
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_arr_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = arr_df.select(
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_arr_b"),
        F.col("n_shingles").alias("n_b"),
    )
    cand_a = a.join(hint(pairs), "id_a")
    return (
        b.join(hint(cand_a), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_arr_a", "sh_arr_b")).cast("long").alias(
                "n_common"
            ),
            "n_a",
            "n_b",
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Group rows by a normalization key (e.g. md5(lower(text))) and
    mark canonicals: returns (id, canonical_id, group_size, is_dup).
    canonical = min id per group (deterministic)."""
    keyed = df.select(F.col(id_col), key.alias("dedup_key"))
    w = W.partitionBy("dedup_key")
    return keyed.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    ).withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    shingled: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """k min-digests per id from a (id, shingle) posting list.

    One groupBy produces all k signature columns h0..h{k-1} — no
    explode-by-salt blowup; each shingle row evaluates k codegen'd md5
    calls, then min-aggregates. Shuffle: one, on id."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_band_rows(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(id, band_id, band_key) rows: signatures folded into
    ``num_hashes/band_size`` md5 band digests, one row per (id, band).
    Shared by the all-pairs and star candidate generators.
    ``num_hashes`` must divide evenly into bands — a remainder would
    silently discard the trailing signature columns and lower recall
    below the (bands, band_size) design point (r8 review)."""
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by band_size="
            f"{band_size}: {num_hashes % band_size} trailing signature "
            "columns would be silently discarded"
        )
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat(*cols)).alias("band_key"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")


def lsh_star_edges(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """BOUNDED-output LSH candidates: per (band_id, band_key) bucket,
    link every member to the bucket's MIN id instead of emitting all
    intra-bucket pairs. Output is ≤ n_bands rows per document —
    O(N·bands), corpus-linear — where the all-pairs form
    (``lsh_candidate_pairs``) emits Σ bucket², which melts on
    mirror-heavy corpora (a 100 TB crawl where one page has 10⁴ copies
    would emit 10⁸ pairs for that family alone; the star emits 10⁴).
    Dup-family transitivity is recovered downstream by connected
    components over the verified star edges (operators/graph.py) —
    the star is exactly the edge set components needs, and within one
    LSH bucket the star already spans the family.

    Bucket minima come from a groupBy-min (NOT a window): the
    hash-aggregate partially combines map-side, so even a 10⁸-member
    mega-bucket arrives at the shuffle as one row per map partition —
    where a WindowExec would buffer/spill the whole bucket in a single
    task. The min table then joins back to the band rows on the
    bucket key (AQE broadcasts it when it fits). Returns distinct
    (id_a, id_b) with id_a < id_b."""
    rows = lsh_band_rows(signatures, id_col, num_hashes, band_size)
    mins = rows.groupBy("band_id", "band_key").agg(F.min(id_col).alias("id_a"))
    return (
        rows.join(mins, ["band_id", "band_key"])
        .select("id_a", F.col(id_col).alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from minhash signatures.

    Signatures fold into ``num_hashes/band_size`` band digests; the
    (id, band_id, band_key) rows self-join on (band_id, band_key). The
    join key is a digest → uniformly distributed → skew-free shuffle.
    Pairs sharing multiple bands are de-duplicated with distinct().

    SCALE CAVEAT (r5 sf1 finding, α=1.73): the OUTPUT is all
    intra-bucket pairs — Σ bucket² — so on duplicate-heavy corpora the
    pair volume, not the join, is the bottleneck. Prefer
    ``lsh_star_edges`` (O(N·bands) output) + connected components when
    the goal is dedup rather than an exhaustive pair listing."""
    exploded = lsh_band_rows(signatures, id_col, num_hashes, band_size)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame,
    id_col: str,
    pairs: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over a (id, shingle) posting list.

    With ``pairs`` given (candidate set from LSH), intersections are
    computed ONLY for those pairs: the candidate list is joined to the
    posting list per side, so the work is O(candidates × shingles-per-
    doc) — linear, never the full N² co-occurrence space. Without,
    scores every co-occurring pair via a posting self-join (quadratic
    in shingle document-frequency; the verification baseline).
    Returns (id_a, id_b, n_common, n_a, n_b) — jaccard left to the
    caller so it can apply deterministic rounding."""
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if pairs is not None:
        # broadcast only the CANDIDATE ids' sizes, not the corpus-wide
        # O(N) sizes table (r8 review): the semi-join keeps the
        # broadcast bounded by the candidate set at any corpus size
        cand_ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sizes = sizes.join(cand_ids, id_col, "left_semi")
    if pairs is not None:
        # candidate-driven intersection: pairs ⋈ postings(a) ⋈ postings(b)
        sh_a = shingled.select(
            F.col(id_col).alias("id_a"), F.col("shingle").alias("sh_a")
        )
        sh_b = shingled.select(
            F.col(id_col).alias("_sh_id_b"), F.col("shingle").alias("sh_b")
        )
        common = (
            pairs.join(sh_a, "id_a")
            .join(
                sh_b,
                (F.col("id_b") == F.col("_sh_id_b"))
                & (F.col("sh_a") == F.col("sh_b")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a = shingled.alias("a")
        b = shingled.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        common.join(F.broadcast(sa), F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(F.broadcast(sb), F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.col("sa.sz").alias("n_a"),
            F.col("sb.sz").alias("n_b"),
        )
    )
    if threshold > 0.0:
        jac = F.col("n_common").cast("double") / (
            F.col("n_a") + F.col("n_b") - F.col("n_common")
        ).cast("double")
        out = out.filter(jac >= threshold)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
_HIGH_NIBBLES = "89abcdef"


def simhash_bit_vote(token_col: str, bit: int) -> Column:
    """±1 vote of ``token`` for signature bit ``bit`` (1-based): the
    high bit of the bit-th hex nibble of md5(token). Pure string ops →
    bit-identical across engines."""
    nibble = F.substring(F.md5(F.col(token_col)), bit, 1)
    return F.when(F.instr(F.lit(_HIGH_NIBBLES), nibble) > 0, 1).otherwise(-1)


def sql_simhash_bit_vote(token_expr: str, bit: int) -> str:
    return (
        f"CASE WHEN INSTR('{_HIGH_NIBBLES}', SUBSTR(MD5({token_expr}), {bit}, 1)) > 0 "
        f"THEN 1 ELSE -1 END"
    )


def simhash(tokens: DataFrame, id_col: str, token_col: str = "token") -> DataFrame:
    """32-bit SimHash per id from a (id, token) list (frequency-weighted:
    duplicate tokens vote repeatedly, the standard weighting).

    The digest is projected ONCE per token row (md5 is the expensive
    part — without the pre-projection each of the 32 vote columns would
    re-hash), then one groupBy with 32 conditional-sum columns (all
    codegen'd) and a single expression folding sign bits into the
    integer signature — no per-row Python, one shuffle."""
    digested = tokens.select(F.col(id_col), F.md5(F.col(token_col)).alias("_digest"))
    votes = [
        F.sum(
            F.when(
                F.instr(F.lit(_HIGH_NIBBLES), F.substring(F.col("_digest"), b, 1)) > 0, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(1, SIMHASH_BITS + 1)
    ]
    agg = digested.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(1, SIMHASH_BITS + 1):
        bit_val = F.when(F.col(f"v{b}") > 0, F.lit(1 << (b - 1))).otherwise(F.lit(0))
        sig = bit_val if sig is None else sig + bit_val
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_narrow(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """32-bit SimHash computed entirely as a NARROW projection — same
    values as ``simhash`` over whitespace tokens, ZERO shuffles.

    Per row: tokenize → md5 each token once (one transform) → for each
    bit, count high-nibble digests with ``size(filter(...))`` (vote sum
    = 2·highs − n_tokens) → fold sign bits into the signature. At
    100 TB this turns a full-corpus explode+shuffle+32-column hash-agg
    into a map-only stage that pipelines with the scan."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    digests = F.transform(toks, lambda t: F.md5(t))
    out = df.select(
        F.col(id_col),
        digests.alias("_digests"),
        F.size(digests).cast("long").alias("_n"),
    )
    # factory, not `lambda d, b=b` — see minhash_signatures_from_arrays
    def bit_is_high(b: int):
        return lambda d: F.instr(F.lit(_HIGH_NIBBLES), F.substring(d, b, 1)) > 0

    sig = None
    for b in range(1, SIMHASH_BITS + 1):
        highs = F.size(F.filter(F.col("_digests"), bit_is_high(b))).cast("long")
        # vote sum v = highs - (n - highs); bit set iff v > 0
        bit_val = F.when(2 * highs - F.col("_n") > 0, F.lit(1 << (b - 1))).otherwise(
            F.lit(0)
        )
        sig = bit_val if sig is None else sig + bit_val
    return out.select(F.col(id_col), sig.cast("long").alias("simhash"))


def hamming_band_candidates(
    sh: DataFrame,
    id_col: str,
    sig_col: str = "simhash",
    max_hamming: int = 3,
    band_bits: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Multi-index hamming search over integer signatures: the
    pigeonhole guarantee that two signatures within hamming distance
    ``max_hamming`` must agree EXACTLY on at least one of ``n_bands``
    disjoint ``band_bits``-bit bands (requires ``max_hamming <
    n_bands``) turns near-dup retrieval into ``n_bands`` band
    equi-joins; the popcount verify runs on candidates only — never
    all pairs. Returns distinct (id_a, id_b, hamming) with
    id_a < id_b and hamming <= max_hamming — by the pigeonhole this is
    EXACTLY the set of all pairs within the radius
    (tests/test_properties_dedup.py proves it against brute force).

    Extracted r11 from the driver-proven ``dedup_simhash_hamming``
    inline plan (plans/northstar.py) so the search is reusable and
    property-testable; that query keeps its proven inline twin until
    its next re-prove window. Band width is the scale knob: 8-bit
    bands (256 buckets) suit 32-bit signatures; 64-bit signatures run
    16-bit bands (65 536 buckets per band) with the same join shape.

    100 TB skew note: the pathological band bucket is a cluster of
    IDENTICAL signatures (exact-duplicate docs) — they collide on all
    ``n_bands`` bands and the listing contract itself is quadratic in
    the cluster size, so no join-side guard can help (the OUTPUT is
    the blowup, same class as the ORACLE_BASELINE pair listings).
    Production pipelines must collapse exact duplicates BEFORE
    near-dup search (pipeline_corpus_curation's ordering: dedup_exact
    → banded near-dup), after which residual buckets hold genuinely
    distinct signatures spread over 2^band_bits values and the
    per-bucket join stays near-constant (measured: sf1 alpha 0.219
    for the 64-bit configuration, SCALE.md r12).
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole needs max_hamming < n_bands: {max_hamming} >= {n_bands}"
        )
    # Extract bands with LOGICAL bit ops (unsigned shift + mask), not
    # arithmetic div/mod: `(_sig div 2^k) % 2^b` rounds toward zero
    # and carries sign for negative (sign-bit-set) signatures, so two
    # 64-bit sigs at hamming distance 1 across the sign bit could
    # produce zero matching bands — violating the pigeonhole
    # completeness guarantee. shiftrightunsigned operates at the
    # column's natural width (int or long), so 32-bit signatures band
    # as 32-bit values and 64-bit as 64-bit.
    shifts = [band_bits * k for k in range(n_bands)]
    mask = (1 << band_bits) - 1
    bands = sh.select(
        F.col(id_col),
        F.col(sig_col).alias("_sig"),
        F.explode(F.array(*[F.lit(s) for s in shifts])).alias("dv"),
    ).withColumn("bv", F.expr(f"shiftrightunsigned(_sig, dv) & {mask}"))
    a, b = bands.alias("a"), bands.alias("b")
    # popcount BEFORE the cross-band distinct (r6 verdict task 4): the
    # filter is codegen'd inside the join stage, so the distinct
    # shuffles d<=max survivors only
    ham = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        a.join(
            b,
            (F.col("a.dv") == F.col("b.dv"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
    )
