"""Declarative data-quality expectations, evaluated in ONE pass.

Engine extension (no reference citation — the reference's only quality
control is the negative-price quarantine, ``pipeline_pyspark.py:123-131``).
A 100-TB ingest runs a battery of assertions before data reaches
training: null rates, value bounds, accepted vocabularies, key
uniqueness. The design constraint at scale is PASS COUNT, not rule
count: every row-level rule compiles into one conditional-sum column of
a SINGLE aggregate over a SINGLE scan (the same
one-pass-many-aggregates shape as ``observe``); uniqueness rules ride
the same aggregate as ``count - countDistinct``. The report then
unpivots the one-row aggregate into one row per rule — a constant-size
frame, no second scan, no shuffle beyond the one global aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named expectation. ``violation`` is a per-row boolean column —
    True means the row VIOLATES the expectation. NULL evaluates as no
    violation unless the rule itself is a null check (write those as
    ``col.isNull()``)."""

    name: str
    violation: Column


def not_null(name: str, col: str) -> Rule:
    return Rule(name, F.col(col).isNull())


def between(name: str, col: str, lo, hi) -> Rule:
    return Rule(name, ~F.col(col).between(lo, hi))


def accepted(name: str, col: str, values: tuple) -> Rule:
    return Rule(name, ~F.col(col).isin(*values))


def positive(name: str, col: str) -> Rule:
    return Rule(name, F.col(col) <= 0)


def check(
    df: DataFrame,
    rules: list[Rule],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate all expectations in one aggregate over one scan.

    Returns (rule, violations, total, passed) with one row per rule.
    ``unique_keys`` maps a rule name to the column list whose
    combinations must be unique; its violation count is
    ``count(rows with every key col non-null) - countDistinct(cols)``
    (exact — swap in ``approx_count_distinct`` at scales where exact
    distinct is the bottleneck). NULL-keyed rows are excluded from BOTH
    sides (countDistinct drops them anyway): a NULL key is not a
    duplicate — pair the rule with ``not_null`` to police NULLs."""
    unique_keys = unique_keys or {}
    aggs = [F.count(F.lit(1)).alias("_total")]
    for r in rules:
        aggs.append(
            F.sum(F.when(r.violation, 1).otherwise(0))
            .cast("long")
            .alias(r.name)
        )
    for name, cols in unique_keys.items():
        # countDistinct silently DROPS any tuple with a NULL component,
        # so the minuend must count the same population (rows where
        # every key column is non-null) — plain count(*) would report
        # every NULL-keyed row as a duplicate, violating the module's
        # NULL contract (NULL keys are not_null's job, not uniqueness's).
        all_set = F.lit(True)
        for c in cols:
            all_set = all_set & F.col(c).isNotNull()
        aggs.append(
            (
                F.count(F.when(all_set, 1))
                - F.countDistinct(*[F.col(c) for c in cols])
            )
            .cast("long")
            .alias(name)
        )
    one = df.agg(*aggs)
    names = [r.name for r in rules] + list(unique_keys)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"), F.col(n).alias("violations")
            )
            for n in names
        ]
    )
    return (
        one.select(F.col("_total").alias("total"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("p.violations").alias("violations"),
            "total",
            (F.col("p.violations") == 0).alias("passed"),
        )
    )
