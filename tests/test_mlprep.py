"""Property tests for the training-data-prep plans (plans/mlprep.py):
invariants the value-hash oracle can't express directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from stacktrend_spark.plans.registry import all_queries

SPECS = all_queries()


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    """Every document lands in exactly one split; totals reconcile."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = SPECS["split_train_test"].fn(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_split_is_deterministic_across_runs(spark, sf_dir):
    a = SPECS["split_train_test"].fn(spark, sf_dir).collect()
    b = SPECS["split_train_test"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_tfidf_topk_rank_invariants(spark, sf_dir):
    """≤3 rows per doc, ranks are exactly 1..k with no gaps/dupes."""
    out = SPECS["text_tfidf_topk"].fn(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set("rnk").alias("rnks"),
    )
    bad = per_doc.filter(
        (F.col("n") > 3) | (F.size("rnks") != F.col("n"))
    ).count()
    assert bad == 0


def test_set_ops_labels_are_disjoint(spark, sf_dir):
    """A customer can't be in both 'both' and 'f_only'."""
    out = SPECS["set_intersect_except"].fn(spark, sf_dir)
    dup = (
        out.groupBy("o_custkey")
        .agg(F.countDistinct("label").alias("n_labels"))
        .filter(F.col("n_labels") > 1)
        .count()
    )
    assert dup == 0


def test_scalable_rank_equals_single_partition_window(spark, sf_dir):
    """Two-phase global rank must equal the classic global window over
    the ENTIRE table (not just the top slice the query returns)."""
    from pyspark.sql import Window as W
    from stacktrend_spark.operators.ranking import global_rank_scalable

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    got = global_rank_scalable(orders, order_cols, "r", num_partitions=7)
    want = orders.withColumn(
        "r", F.row_number().over(W.orderBy(*order_cols)).cast("long")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_connected_components_invariants(spark):
    """Both endpoints of every edge share a component; the component id
    is the smallest member; isolated nodes self-label."""
    from stacktrend_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(n,) for n in [1, 2, 3, 10, 11, 20, 21, 22, 99]], "node long")
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 99: 99}
    got = {r["node"]: r["component"] for r in connected_components(edges, nodes).collect()}
    assert got == want
    # distributed min-label loop (fast path disabled) must agree exactly
    slow = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, nodes, driver_fastpath_max_edges=0
        ).collect()
    }
    assert slow == want


def test_connected_components_paths_agree_on_random_graph(spark):
    """Driver union-find fast path vs distributed min-label loop on a
    seeded random graph: identical labelings."""
    import random

    from stacktrend_spark.operators.graph import connected_components

    rng = random.Random(5)
    # small + dense: the distributed path runs diameter-many iterations
    # (each several Spark jobs), so keep the graph's diameter tiny
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    fast = {r["node"]: r["component"] for r in connected_components(e, nodes).collect()}
    slow = {
        r["node"]: r["component"]
        for r in connected_components(e, nodes, driver_fastpath_max_edges=0).collect()
    }
    assert fast == slow


def test_zorder_key_matches_python_reference(spark):
    """Morton interleave: Spark column expression vs pure-Python bits."""
    from stacktrend_spark.functions.zorder import zorder_key2

    def py_z(x: int, y: int, bits: int = 12) -> int:
        acc = 0
        for i in range(bits):
            acc |= ((x >> i) & 1) << (2 * i)
            acc |= ((y >> i) & 1) << (2 * i + 1)
        return acc

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095), (1234, 987)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key2(F.col("x"), F.col("y"), 12).alias("z")).collect()
    }
    assert got == {(x, y): py_z(x, y) for x, y in rows}


def test_hot_bucket_guard_splits_and_preserves_pairs(spark):
    """The embedding-cosine hot-bucket guard (triangle-grid self-join
    decomposition) must produce EXACTLY the same pair set as the plain
    bucket join while actually splitting the hot bucket into multiple
    cells."""
    import itertools

    from stacktrend_spark.operators.similarity import cosine_near_dup_pairs

    # one hot bucket (60 rows) + one cold bucket (5 rows)
    rows = [
        (i, "hot" if i < 60 else "cold", [float((i * 7 + j * 3) % 10 + 1) for j in range(4)])
        for i in range(65)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")

    plain = cosine_near_dup_pairs(
        emb, threshold=0.9, bucket_col="label", dim=4
    )
    guarded = cosine_near_dup_pairs(
        emb, threshold=0.9, bucket_col="label", dim=4, max_bucket_rows=10
    )
    p = {(r.id_a, r.id_b, r.cosine_sim) for r in plain.collect()}
    g = {(r.id_a, r.id_b, r.cosine_sim) for r in guarded.collect()}
    assert g == p and len(p) > 0

    # the guard really splits: hot bucket must spread over >1 chunk
    # (g = ceil(60/10) = 6) while the cold bucket stays single-chunk
    from pyspark.sql import functions as F2

    counts = emb.groupBy("label").agg(F2.count(F2.lit(1)).alias("n"))
    split = counts.select(
        "label",
        F2.greatest(F2.lit(1), F2.ceil(F2.col("n") / F2.lit(10))).alias("cells"),
    ).collect()
    by_label = {r.label: r.cells for r in split}
    assert by_label["hot"] == 6 and by_label["cold"] == 1
    # grid covers every unordered cell pair exactly once
    cells = {(i, j) for i, j in itertools.product(range(6), range(6)) if i <= j}
    assert len(cells) == 21
