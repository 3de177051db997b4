"""skyline_2d vs the quadratic dominance definition, on adversarial
data: duplicate points (both survive), same-price chains (only the max
survives), and a dense grid (skyline = the anti-diagonal corner)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from esther_apache_spark_spark.operators.skyline import skyline_2d


def _naive(pdf: pd.DataFrame) -> set[tuple]:
    pts = pdf[["price", "size"]].to_numpy()
    keep = []
    for i, (pr, sz) in enumerate(pts):
        dominated = (
            (pts[:, 0] <= pr)
            & (pts[:, 1] >= sz)
            & ((pts[:, 0] < pr) | (pts[:, 1] > sz))
        ).any()
        if not dominated:
            keep.append(i)
    return set(map(tuple, pdf.iloc[keep][["pid", "price", "size"]].to_numpy()))


def _check(spark, pdf, partitions):
    df = spark.createDataFrame(pdf).repartition(partitions)
    got = set(
        map(tuple, skyline_2d(df, "price", "size").toPandas().to_numpy())
    )
    assert got == _naive(pdf)


def test_skyline_matches_naive_random(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(400),
            "price": np.round(rng.uniform(1, 100, 400), 1),
            "size": rng.integers(1, 50, 400),
        }
    )
    _check(spark, pdf, 8)


def test_skyline_keeps_both_dim_ties_and_drops_same_price_losers(spark):
    pdf = pd.DataFrame(
        {
            "pid": [1, 2, 3, 4, 5],
            "price": [10.0, 10.0, 10.0, 5.0, 20.0],
            # pid 1/2 tie on (10, 9) -> both kept unless dominated;
            # pid 4 at (5, 9) dominates them (cheaper, same size);
            # pid 5 at (20, 12) survives (largest size)
            "size": [9, 9, 7, 9, 12],
        }
    )
    _check(spark, pdf, 3)


def test_skyline_excludes_null_dimension_rows(spark):
    pdf = pd.DataFrame(
        {
            "pid": [1, 2, 3],
            "price": [10.0, None, 5.0],
            "size": [9, 12, None],
        }
    )
    df = spark.createDataFrame(pdf)
    got = skyline_2d(df, "price", "size").toPandas()
    assert got["pid"].tolist() == [1]


def test_skyline_merge_spans_arrow_batches(spark):
    """The merge pass must compare candidates ACROSS Arrow batches: with
    a tiny maxRecordsPerBatch, a dominating row in one batch must still
    eliminate dominated rows that arrive in other batches."""
    from esther_apache_spark_spark.operators.skyline import skyline_2d

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        rows = [(i, float(i), float(i)) for i in range(1, 60)]
        rows.append((1000, 0.0, 1e6))  # dominates every other row
        df = spark.createDataFrame(rows, "id long, lo double, hi double")
        got = skyline_2d(df, "lo", "hi").collect()
        assert [r["id"] for r in got] == [1000], got
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
