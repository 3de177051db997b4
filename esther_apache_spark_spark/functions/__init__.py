"""Scalar / column function library (native Catalyst expressions first).

The reference's only two Python UDFs — ``controle_bool`` and
``order_date_str`` (``pipeline_pyspark.py:36-56``) — are opaque
``BatchEvalPython`` barriers that block pushdown and force JVM↔Python
serialization. Here they are rewritten as native column expressions so
the whole pipeline stays inside whole-stage codegen (SURVEY.md §4).
"""

from esther_apache_spark_spark.functions.cleaning import (
    order_date_str,
    parse_multiformat_ts,
    truthy_bool,
)
from esther_apache_spark_spark.functions.text import (
    char_ngrams,
    normalize_text,
    tokenize,
    word_shingles,
)
from esther_apache_spark_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "truthy_bool",
    "order_date_str",
    "parse_multiformat_ts",
    "tokenize",
    "normalize_text",
    "char_ngrams",
    "word_shingles",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
