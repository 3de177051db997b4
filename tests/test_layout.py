"""Z-order layout: Morton index correctness + the data-skipping win
the clustered write actually delivers on disk."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from esther_apache_spark_spark.operators.layout import (
    write_zordered,
    zorder_index,
    zorder_index_sql,
)
from esther_apache_spark_spark.schemas import load_table


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_index_matches_bit_interleave_reference(spark):
    pts = [(x, y) for x in (0, 1, 5, 37, 200, 255) for y in (0, 2, 9, 111, 254, 255)]
    df = spark.createDataFrame(pts, "x int, y int").select(
        "x", "y", zorder_index(F.col("x"), F.col("y"), 8).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_ref(r.x, r.y, 8), (r.x, r.y)


def test_zorder_index_sql_twin_matches(spark, duck):
    df = spark.range(300).select(
        (F.col("id") % 256).cast("int").alias("x"),
        ((F.col("id") * 37) % 256).cast("int").alias("y"),
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_index(F.col("x"), F.col("y"), 8).alias("z")).collect()
    }
    sql = (
        "SELECT x, y, "
        + zorder_index_sql("x", "y", 8)
        + " AS z FROM (SELECT i % 256 AS x, (i * 37) % 256 AS y "
        + "FROM (SELECT unnest(range(300)) AS i))"
    )
    for x, y, z in duck.execute(sql).fetchall():
        assert got[(x, y)] == z


def test_write_zordered_shrinks_per_file_bounding_boxes(spark, sf_dir, tmp_path):
    """The point of the clustered write: each output file covers a small
    (x, y) bounding box, so parquet min/max stats prune on BOTH columns.
    Compare total bbox area per file against an unclustered write of the
    same data into the same number of files."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(256)).cast("int").alias("x"),
        F.pmod(
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))),
            F.lit(256),
        )
        .cast("int")
        .alias("y"),
        "o_orderkey",
    )
    zpath = str(tmp_path / "zordered")
    npath = str(tmp_path / "naive")
    write_zordered(orders, zpath, F.col("x"), F.col("y"), bits=8, n_files=8)
    orders.repartition(8).write.mode("overwrite").parquet(npath)

    def total_bbox_area(path: str) -> int:
        area = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            t = pq.read_table(f, columns=["x", "y"])
            if t.num_rows == 0:
                continue
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            area += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return area

    z_area, n_area = total_bbox_area(zpath), total_bbox_area(npath)
    # naive round-robin files each span ~the whole 256x256 space; the
    # z-ordered files cover compact Morton ranges — require a real win,
    # not a tie (observed ~8-30x smaller at sf0.001)
    assert z_area < n_area / 2, (z_area, n_area)


def test_write_zordered_preserves_rows(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(256)).cast("int").alias("x"),
        F.pmod(
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))),
            F.lit(256),
        )
        .cast("int")
        .alias("y"),
        "o_orderkey",
    )
    path = str(tmp_path / "zroundtrip")
    write_zordered(orders, path, F.col("x"), F.col("y"), bits=8, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # no helper column leaks into the written schema
    assert "_zidx" not in back.columns


@pytest.mark.parametrize("n_pos,n_neg", [(0, 5), (5, 0)])
def test_auc_degenerate_single_class_is_null(spark, n_pos, n_neg):
    """AUC is undefined with one class present: the NULLIF guard must
    yield NULL, not a division error — pinned here because the catalog
    query's label split could in principle be degenerate at tiny sf."""
    from pyspark.sql import Window

    rows = [(float(i) / 10.0, 1) for i in range(n_pos)] + [
        (float(i) / 7.0, 0) for i in range(n_neg)
    ]
    df = spark.createDataFrame(rows, "score double, pos long")
    per = df.groupBy("score").agg(
        F.sum("pos").alias("np_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("nn_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    per = per.withColumn("nn_lt", F.coalesce(F.sum("nn_s").over(w), F.lit(0)))
    out = per.agg(
        F.sum("np_s").alias("n_pos"),
        F.sum("nn_s").alias("n_neg"),
        F.sum(F.col("np_s") * (2 * F.col("nn_lt") + F.col("nn_s"))).alias("u2"),
    ).select(
        F.round(
            F.col("u2").cast("double")
            / F.nullif(F.lit(2.0) * F.col("n_pos") * F.col("n_neg"), F.lit(0.0)),
            9,
        ).alias("auc")
    )
    assert out.collect()[0]["auc"] is None


def test_auc_known_value(spark):
    """Hand-checkable AUC: scores (1,2,3,4), labels (0,0,1,1) -> perfect
    separation AUC=1; one tie case: scores (1,2,2,3), labels (0,1,0,1)
    -> pairs: (2>1:1) + (2=2:0.5) + (3>1:1) + (3>2:1) over 4 = 0.875."""
    from esther_apache_spark_spark.plans.evaluation import quality_classifier_auc  # noqa: F401
    from pyspark.sql import Window

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score double, pos long")
        per = df.groupBy("score").agg(
            F.sum("pos").alias("np_s"),
            (F.count(F.lit(1)) - F.sum("pos")).alias("nn_s"),
        )
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        per = per.withColumn("nn_lt", F.coalesce(F.sum("nn_s").over(w), F.lit(0)))
        row = per.agg(
            F.sum("np_s").alias("np"),
            F.sum("nn_s").alias("nn"),
            F.sum(F.col("np_s") * (2 * F.col("nn_lt") + F.col("nn_s"))).alias("u2"),
        ).collect()[0]
        return row.u2 / (2.0 * row.np * row.nn)

    assert auc_of([(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]) == 1.0
    assert auc_of([(1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)]) == 0.875
