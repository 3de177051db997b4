"""Vector expressions over ``array<float>`` embedding columns.

Engine extension (SURVEY.md §7 M4): no reference citation — the
reference has no vector surface. Implemented as higher-order built-in
functions (``zip_with`` / ``aggregate``) so similarity math stays
JVM-side; the Pandas-UDF path in ``operators.similarity`` is the
vectorized alternative for wide top-k scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
