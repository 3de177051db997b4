"""Range join equivalence: the bucketized equi-join form must match the
naive all-pairs BETWEEN join exactly, including boundary inclusivity."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from esther_apache_spark_spark.operators.rangejoin import range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, _ts(f"2025-01-01 {h:02d}:{m:02d}:00")) for i, (h, m) in enumerate(
            [(0, 0), (0, 59), (1, 0), (2, 30), (5, 0), (11, 59), (23, 59)]
        )],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts("2025-01-01 00:00:00"), _ts("2025-01-01 01:00:00")),  # ends on boundary
            (101, _ts("2025-01-01 02:00:00"), _ts("2025-01-01 06:00:00")),
            (102, _ts("2025-01-01 12:00:00"), _ts("2025-01-01 12:00:00")),  # zero-length
            (103, _ts("2025-01-01 00:30:00"), _ts("2025-01-02 00:00:00")),  # long
        ],
        "ivid long, s timestamp, e timestamp",
    )
    got = {
        (r["pid"], r["ivid"])
        for r in range_join(points, intervals, "ts", "s", "e", bucket_seconds=1800).collect()
    }
    naive = {
        (r["pid"], r["ivid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
        .collect()
    }
    assert got == naive
    assert (2, 100) in got      # inclusive upper bound: 01:00 in [00:00, 01:00]
    assert (0, 100) in got      # inclusive lower bound
    # bucket size larger than some intervals must also be exact
    got_big = {
        (r["pid"], r["ivid"])
        for r in range_join(points, intervals, "ts", "s", "e", bucket_seconds=86400).collect()
    }
    assert got_big == naive
