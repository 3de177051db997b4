"""Query catalog — every SURVEY.md §2 operator as a named, oracle-checked query."""

from esther_apache_spark_spark.plans.catalog import (
    QUERIES,
    QuerySpec,
    oracle_sql,
    queries,
    register,
)

# Importing these modules populates the registry.
from esther_apache_spark_spark.plans import parity  # noqa: E402,F401
from esther_apache_spark_spark.plans import extensions  # noqa: E402,F401
from esther_apache_spark_spark.plans import freshkart_plans  # noqa: E402,F401
from esther_apache_spark_spark.plans import tpch_more  # noqa: E402,F401
from esther_apache_spark_spark.plans import corpus_ops  # noqa: E402,F401
from esther_apache_spark_spark.plans import incremental_plans  # noqa: E402,F401
from esther_apache_spark_spark.plans import analytics  # noqa: E402,F401
from esther_apache_spark_spark.plans import evaluation  # noqa: E402,F401
from esther_apache_spark_spark.plans import warehouse  # noqa: E402,F401
from esther_apache_spark_spark.plans import mlprep  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "register", "queries", "oracle_sql"]
