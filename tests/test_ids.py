"""assign_contiguous_ids: dense 0..N-1, deterministic under the total
order, invariant to input partitioning and partition-count choice."""

from __future__ import annotations

from pyspark.sql import functions as F

from esther_apache_spark_spark.operators.ids import assign_contiguous_ids


def _ids(spark, df, parts):
    out = assign_contiguous_ids(
        df, [F.col("k"), F.col("x")], id_col="uid", num_partitions=parts
    )
    rows = out.collect()
    out.unpersist() if hasattr(out, "unpersist") else None
    return {(r["k"], r["x"]): r["uid"] for r in rows}


def test_dense_deterministic_and_partition_invariant(spark):
    data = [(i % 7, i * 31 % 101) for i in range(300)]
    df = spark.createDataFrame(data, "k int, x int").repartition(13)
    a = _ids(spark, df, 5)
    # dense 0..N-1
    assert sorted(a.values()) == list(range(300))
    # equals the global-order rank
    ranked = sorted(a.keys())
    assert all(a[key] == i for i, key in enumerate(ranked))
    # invariant to partition count and input layout
    b = _ids(spark, df.repartition(3), 9)
    assert a == b
