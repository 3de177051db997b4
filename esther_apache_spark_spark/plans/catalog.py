"""Registry of named queries with DuckDB oracle twins.

Differential/oracle testing is the reference's *intended* strategy (its
``test/test_pipeline_equivalence.py`` is an empty file; the pandas twin
pipeline is its de-facto oracle — SURVEY.md §5). Here every operator is a
named query plus an ANSI-SQL oracle the driver runs in DuckDB.

Oracle-match rules (driver sorts columns by name, hashes values
order-insensitively):

- alias every computed column identically in Spark and SQL;
- round floating aggregates (sum/avg/corr) — double reduction order
  differs between engines;
- emit timestamps as epoch micros (``unix_micros`` / ``epoch_us``) or
  ISO strings (``date_format`` / ``strftime``), never raw timestamps;
- cast DuckDB ``SUM(BIGINT)`` (HUGEINT) back to BIGINT to match Spark.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
