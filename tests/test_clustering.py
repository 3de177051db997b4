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
