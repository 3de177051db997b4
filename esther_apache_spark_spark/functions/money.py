"""Decimal-exact money arithmetic — cross-engine deterministic aggregates.

Why this exists: summing doubles is order-dependent (shuffle order
changes the last ulps), and Spark and DuckDB round doubles differently —
Spark rounds the shortest-decimal representation (8285.425 → 8285.43)
while DuckDB rounds the exact binary value (8285.42499… → 8285.42). For
money columns whose *intended* values have 2 decimals, both problems
disappear if arithmetic is done in DECIMAL: the cast recovers the exact
intended value in both engines, decimal sums are exact in any order, and
decimal ROUND is exact half-away-from-zero in both.

The matching oracle-SQL fragments use the same DECIMAL type widths so
neither engine overflows (DuckDB errors at width 38; Spark silently
truncates scale — both avoided by keeping inputs narrow).

Pattern (Spark / DuckDB):

    F.round(F.sum(dec2(c) * one_minus(d)), 2).cast("double")
    ROUND(SUM(CAST(c AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(d AS DECIMAL(3,2)))), 2)::DOUBLE
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRICE = "decimal(12,2)"  # l_extendedprice, value, c_acctbal (< 1e10)
TOTAL = "decimal(14,2)"  # o_totalprice
FRAC = "decimal(3,2)"    # l_discount, l_tax (< 1.0 at 2 decimals)


def dec2(col: Column | str, typ: str = PRICE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def one_minus(frac_col: Column | str) -> Column:
    """(1 - discount) in narrow decimal — keeps product widths small."""
    return F.lit(1).cast(FRAC) - dec2(frac_col, FRAC)


def one_plus(frac_col: Column | str) -> Column:
    return F.lit(1).cast(FRAC) + dec2(frac_col, FRAC)


def money_sum(col: Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum, rounded and emitted as double."""
    return F.round(F.sum(col), scale).cast("double").alias(alias)


def mean_of_dec(col: Column, alias: str, scale: int = 4) -> Column:
    """avg as (exact decimal sum → double) / count: the division is a
    single double op on identical inputs in both engines, so the result
    is bit-identical; round(scale) is then stable."""
    return F.round(F.sum(col).cast("double") / F.count(F.lit(1)), scale).alias(alias)
