"""Relational + data-pipeline operators (SURVEY.md §2.4-§2.8, §7 M4)."""

from esther_apache_spark_spark.operators.windows import keep_first, top_k, top_k_per_group

__all__ = ["keep_first", "top_k", "top_k_per_group"]
