"""Data-cleaning expressions — native rewrites of the reference's UDFs.

Reference UDF truth tables preserved exactly (SURVEY.md §2.9 F8/F9, §7
hard-part 1):

``controle_bool`` (``pipeline_pyspark.py:36-45``)::

    None                  -> False
    bool/int/float v      -> bool(v)        (any nonzero number -> True)
    str s                 -> s.strip().lower() in {'1','true','yes','y','t'}

``order_date_str`` (``pipeline_pyspark.py:48-56``)::

    'YYYY-MM-DD HH:MM:SS' -> 'YYYY-MM-DD'
    'YYYY-MM-DD'          -> 'YYYY-MM-DD'
    anything else         -> error (fail-fast)

Both are pure column expressions: no Python worker, fully codegen-able,
predicates push through them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TRUTHY = ("1", "true", "yes", "y", "t")


def truthy_bool(col: Column, dtype: T.DataType | None = None) -> Column:
    """Native equivalent of the reference's ``controle_bool`` UDF.

    ``dtype`` is the input column's Spark type; pass it when known (e.g.
    from ``df.schema``) so numeric inputs get Python ``bool(v)`` semantics
    (nonzero -> True) while string inputs get the strict truthy-set
    semantics. With no dtype (or StringType), string semantics apply —
    matching the reference's CSV path where the dirty column arrives as
    string.
    """
    if isinstance(dtype, T.BooleanType):
        return F.coalesce(col, F.lit(False))
    if isinstance(dtype, T.NumericType):
        return F.when(col.isNull(), F.lit(False)).otherwise(col != F.lit(0))
    s = F.lower(F.trim(col.cast("string")))
    return F.when(col.isNull(), F.lit(False)).otherwise(s.isin(*_TRUTHY))


def truthy_bool_for(df, colname: str) -> Column:
    """``truthy_bool`` with the dtype looked up from ``df.schema``."""
    return truthy_bool(F.col(colname), df.schema[colname].dataType)


def parse_multiformat_ts(col: Column, fail_on_unparseable: bool = False) -> Column:
    """Parse ``'YYYY-MM-DD HH:MM:SS'`` or ``'YYYY-MM-DD'`` strings to timestamp.

    Native rewrite of the reference's ``order_date_str`` UDF parse step
    (``pipeline_pyspark.py:48-56``), edge cases included: the reference
    does ``str(value or '').strip()`` before parsing, so surrounding
    whitespace is tolerated (handled by ``trim``) and None/empty input
    is unparseable. With ``fail_on_unparseable`` the reference's
    raise-on-garbage behavior is preserved via ``raise_error`` —
    including the raise on NULL/empty, exactly like the reference's
    raise-on-None; otherwise unparseable input yields NULL
    (quarantine-friendly).
    """
    cleaned = F.trim(col)
    parsed = F.coalesce(
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd")),
    )
    if fail_on_unparseable:
        return F.when(
            parsed.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("unparseable created_at: "),
                    F.coalesce(col.cast("string"), F.lit("NULL")),
                )
            ),
        ).otherwise(parsed)
    return parsed


def order_date_str(col: Column, fail_on_unparseable: bool = False) -> Column:
    """ISO ``'YYYY-MM-DD'`` string from a multi-format date string.

    Output stays a *string* to match the reference's export semantics
    (it never uses DateType in the pipeline — SURVEY.md §1.3).
    """
    return F.date_format(parse_multiformat_ts(col, fail_on_unparseable), "yyyy-MM-dd")
