"""Range join — point-in-interval matching Spark has no native operator
for (engine extension; the reference has no temporal joins at all,
SURVEY.md §2.4 "Not present ... theta/range/as-of/interval joins").

A naive ``ON ts BETWEEN start AND end`` join plans as
BroadcastNestedLoopJoin (all-pairs per partition) — quadratic and
broadcast-bound. This operator rewrites it as an equi-join: quantize
time into fixed buckets, give each point its single bucket, explode each
interval into the buckets it covers, equi-join on bucket, then apply the
exact BETWEEN as a residual filter. A (point, interval) pair can meet in
only one bucket — the point's — so no dedup pass is needed.

Scale properties: the join is an ordinary hash/sort-merge shuffle on the
bucket key; cost is O(points + Σ interval_buckets + matches). Choose
``bucket_seconds`` near the typical interval length — too small inflates
the interval explode, too large inflates the residual filter's false
candidates. Skewed hot buckets are split by AQE; tiny interval sets
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= ts <= end`` (both ends inclusive, matching SQL BETWEEN).
    Returns all columns of both inputs."""
    us = bucket_seconds * 1_000_000
    pb = points.withColumn("_rb", F.floor(F.unix_micros(F.col(ts_col)) / us))
    ib = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / us),
                F.floor(F.unix_micros(F.col(end_col)) / us),
            )
        ),
    )
    if broadcast_intervals:
        ib = F.broadcast(ib)
    return (
        pb.join(ib, "_rb")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_rb")
    )
