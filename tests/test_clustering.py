"""Behavioral guarantees of the full-corpus Lloyd operator that the
DuckDB oracle (tests/test_catalog_oracle.py) cannot state: monotone
improvement across rounds and partition-count invariance."""

from pyspark.sql import functions as F

from esther_apache_spark_spark.operators.clustering import kmeans_lloyd_summary
from esther_apache_spark_spark.schemas import load_table


def _total_inertia(df):
    return int(df.agg(F.sum("inertia").alias("t")).collect()[0]["t"])


def test_inertia_non_increasing_across_rounds(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    i1 = _total_inertia(kmeans_lloyd_summary(emb, k=8, iters=1))
    i3 = _total_inertia(kmeans_lloyd_summary(emb, k=8, iters=3))
    assert i3 <= i1


def test_assignment_partition_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_lloyd_summary(emb, k=8, iters=2).collect()))
    b = sorted(
        map(tuple, kmeans_lloyd_summary(emb.repartition(7), k=8, iters=2).collect())
    )
    assert a == b


def test_all_vectors_assigned(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_lloyd_summary(emb, k=8, iters=2)
    assert int(out.agg(F.sum("n_vecs").alias("n")).collect()[0]["n"]) == emb.count()


def test_kmeans_fewer_vectors_than_k(spark):
    """n < k: every vector seeds its own cluster; assignment is
    identity, inertia 0, no crash, no empty-cluster artifacts."""
    import pyspark.sql.functions as F

    rows = [(i, [float(i), float(-i)]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd_summary(emb, k=8, iters=2).collect()
    assert len(out) == 5
    assert all(r["n_vecs"] == 1 and r["inertia"] == 0 for r in out)


def test_kmeans_empty_input(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_lloyd_summary(emb, k=4, iters=1).count() == 0


def test_hll_det_empty_input(spark):
    from esther_apache_spark_spark.operators.sketches import hll_det_estimate

    df = spark.createDataFrame([], "k long, g string")
    assert hll_det_estimate(df, "k", ["g"]).count() == 0


def test_kmeans_identical_vectors_single_cluster(spark):
    """All-identical vectors: k seeds collapse to the same centroid;
    ties break to the lowest cluster id, so exactly ONE cluster
    survives with everything in it and zero inertia."""
    rows = [(i, [1.5, -2.5]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd_summary(emb, k=4, iters=2).collect()
    assert len(out) == 1
    assert out[0]["cluster_id"] == 0
    assert out[0]["n_vecs"] == 20
    assert out[0]["inertia"] == 0


def test_arrow_assignment_matches_expression_path(spark, sf_dir):
    """assign_via='arrow' (int64-GEMM mapInArrow kernel) must be
    bit-identical to the expression fold — same distances, same
    (dist, cid) tie-break, same trained model."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_lloyd_summary(emb, k=8, iters=2).collect()))
    b = sorted(
        map(
            tuple,
            kmeans_lloyd_summary(emb, k=8, iters=2, assign_via="arrow").collect(),
        )
    )
    assert a == b


def test_kmeans_offset_sparse_ids_seed_full_k(spark):
    """Regression (ADVICE r5): seeding must be by RANK, not `vec_id < k`
    — an offset/sparse id domain (e.g. a filtered or sampled corpus)
    must still yield exactly min(n, k) seeds, assign every vector, and
    produce no NULL clusters."""
    rows = [(1000 + 7 * i, [float((i * 13) % 5), float((i * 31) % 7)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd_summary(emb, k=8, iters=2).collect()
    assert all(r["cluster_id"] is not None for r in out)
    assert sum(r["n_vecs"] for r in out) == 40
    # cids are rank-based 0..k-1, regardless of the id domain
    assert set(r["cluster_id"] for r in out) <= set(range(8))
    assert len(out) >= 2  # the synthetic grid is not one point


def test_kmeans_offset_ids_match_contiguous_relabel(spark):
    """Shifting every vec_id by a constant changes nothing but labels:
    the rank-based seeding must produce identical (n_vecs, inertia,
    centroid_l1) multisets."""
    rows = [(i, [float((i * 13) % 5), float((i * 31) % 7)]) for i in range(40)]
    emb0 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb1 = emb0.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    a = sorted(
        (r["n_vecs"], r["inertia"], r["centroid_l1"])
        for r in kmeans_lloyd_summary(emb0, k=4, iters=2).collect()
    )
    b = sorted(
        (r["n_vecs"], r["inertia"], r["centroid_l1"])
        for r in kmeans_lloyd_summary(emb1, k=4, iters=2).collect()
    )
    assert a == b
