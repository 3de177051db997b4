"""Multi-dimensional data layout — Z-order (Morton) clustering.

The 100 TB lever the other operators don't cover: WHERE the rows sit.
Parquet data skipping prunes row groups by min/max stats, but stats
only help when the sort order correlates with the query predicate. A
single-column sort gives perfect pruning on that column and none on
any other; interleaving the bits of two (or more) bucketed key columns
into one Morton index gives every participating column *partial*
locality, so a predicate on ANY of them prunes most chunks (the
Delta/Iceberg `OPTIMIZE ZORDER BY` doctrine).

Everything here is integer arithmetic on bucketed keys — div, mod,
multiply by power-of-two literals — so the index is bit-identical in
Spark and DuckDB and the audit query replays as a plain SQL oracle.

Scale shape: computing the index is a narrow projection (no shuffle);
laying data out is one `repartitionByRange` on the index (range
exchange = sample + shuffle) followed by `sortWithinPartitions`, which
is exactly how a 1000-executor compaction job would write it — no
global sort, no single-task order-by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_index(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave two already-bucketed non-negative int columns
    (each < 2**bits) into a single z-index column.

    Unrolled as ``sum_i ((x div 2^i) % 2) * 4^i  +  ((y div 2^i) % 2)
    * 2 * 4^i`` — pure 64-bit integer terms, no UDF, no bit-twiddling
    builtins (``shiftleft`` et al. differ in signature across engines;
    div/mod/mul replay everywhere)."""
    acc: Column = F.lit(0).cast("long")
    for i in range(bits):
        xbit = (x.cast("long") / F.lit(2**i)).cast("long") % 2
        ybit = (y.cast("long") / F.lit(2**i)).cast("long") % 2
        acc = acc + xbit * F.lit(4**i) + ybit * F.lit(2 * 4**i)
    return acc


def zorder_index_sql(x: str, y: str, bits: int = 8) -> str:
    """The same Morton interleave as ANSI SQL (DuckDB oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} // {2**i}) % 2) * {4**i}")
        terms.append(f"(({y} // {2**i}) % 2) * {2 * 4**i}")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of (x, y).

    Range-partition on the z-index (distributed sample-based split
    points — the same exchange a 1000-way cluster write uses), sort
    within each partition, drop the helper column, write. Each output
    file then covers a compact z-range, i.e. a small bounding box in
    (x, y) space, so min/max row-group stats prune on BOTH columns."""
    staged = df.withColumn("_zidx", zorder_index(x, y, bits))
    (
        staged.repartitionByRange(n_files, F.col("_zidx"))
        .sortWithinPartitions("_zidx")
        .drop("_zidx")
        .write.mode("overwrite")
        .parquet(path)
    )
