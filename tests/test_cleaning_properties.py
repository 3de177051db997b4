"""Property tests: native F8/F9 rewrites vs the reference UDF truth
tables (SURVEY.md §5 item 3, §7 hard-part 1).

The reference functions are re-stated here from their documented truth
tables (``pipeline_pyspark.py:36-56``) — the property is that our native
column expressions agree with those semantics over generated edge cases.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from esther_apache_spark_spark.functions.cleaning import (
    order_date_str,
    truthy_bool,
)


# Reference truth tables (restated, not copied):
def ref_controle_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return bool(v)
    if v is None:
        return False
    return str(v).strip().lower() in ("1", "true", "yes", "y", "t")


def ref_order_date_str(value):
    value = str(value or "").strip()
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(value, fmt).date().isoformat()
        except ValueError:
            continue
    return None  # our non-failing mode maps garbage to NULL


_STRINGS = st.one_of(
    st.none(),
    st.sampled_from(
        ["1", "0", "true", "True", "TRUE", " True ", "yes", "y", "t", "T",
         "no", "n", "false", "", "  ", "garbage", "2", "-1", "0.0", "oui"]
    ),
    # ASCII only: Python str.strip() strips unicode whitespace, Spark
    # trim() strips ASCII space — a known, documented divergence outside
    # the reference's CSV domain.
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=8
    ),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_STRINGS, min_size=1, max_size=30))
def test_truthy_bool_string_semantics(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", truthy_bool(F.col("v")).alias("b")).collect()
    }
    for i, v in enumerate(values):
        assert got[i] == ref_controle_bool(v), (i, v)


@pytest.mark.parametrize(
    "dtype,values",
    [
        (T.IntegerType(), [None, 0, 1, -3, 7]),
        (T.DoubleType(), [None, 0.0, -0.0, 0.5, -2.25, float("nan")]),
        (T.BooleanType(), [None, True, False]),
    ],
)
def test_truthy_bool_numeric_and_bool_semantics(spark, dtype, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType(
            [T.StructField("i", T.IntegerType()), T.StructField("v", dtype)]
        ),
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", truthy_bool(F.col("v"), dtype).alias("b")).collect()
    }
    for i, v in enumerate(values):
        want = ref_controle_bool(v) if v == v else True  # bool(nan) is True
        assert got[i] == want, (i, v)


_DATES = st.one_of(
    st.sampled_from(
        [
            "2025-03-01 12:30:45",
            "2025-03-01",
            "2025-12-31 00:00:00",
            "2025-02-28",
            "not a date",
            "2025-13-01",  # bad month
            "2025-03-32",  # bad day
            "",
            None,
            "2025-03-01T12:30:45",  # ISO-T form is NOT in the accepted set
        ]
    ),
    st.dates().map(lambda d: d.isoformat()),
    st.datetimes(
        min_value=datetime(1971, 1, 1), max_value=datetime(2100, 1, 1)
    ).map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_DATES, min_size=1, max_size=30))
def test_order_date_str_semantics(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", order_date_str(F.col("v")).alias("d")).collect()
    }
    for i, v in enumerate(values):
        assert got[i] == ref_order_date_str(v), (i, v)
