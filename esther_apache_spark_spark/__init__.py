"""esther_apache_spark_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference project ``Jean-ThomasM/esther_apache_spark`` (a
PySpark + pandas batch ETL over e-commerce sales data), extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) and Structured Streaming.

Design stance (SURVEY.md §7): a thin, idiomatic PySpark library built on
the DataFrame / SQL API so Catalyst + Tungsten pick physical strategies.
Explicit schemas everywhere (no inference at scale), built-in expressions
over Python UDFs (the reference's two scalar UDFs are rewritten as native
column expressions — see ``functions.cleaning``), broadcast the small
dimensions, AQE on.
"""

from esther_apache_spark_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
