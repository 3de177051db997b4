"""Window-function operators (SURVEY.md §2.6-§2.7).

W1 — the reference's only window use is ranking-for-dedup:
``row_number() over (partition by order_id order by created_at)`` then
``rn == 1`` (``pipeline_pyspark.py:133-138``). Ties on the order key make
that nondeterministic (SURVEY.md §2.6 note), so ``keep_first`` requires a
total order via explicit tiebreakers — mandatory for stable oracle hashes
and for reproducible pipelines at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def keep_first(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Dedup keep-first-per-key under a *total* order (W1 + deterministic
    tiebreak). Pass enough ``order_by`` columns to break all ties.

    Plan shape: one shuffle on ``keys``, then a single-pass window —
    Spark's WindowExec is spill-aware, so hot keys degrade to disk
    rather than OOM; for extreme skew pre-aggregate with ``min_by``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def top_k(df: DataFrame, order_col: str | Column, k: int, ascending: bool = False) -> DataFrame:
    """O3 — global top-k. ``orderBy + limit`` lets Catalyst plan
    TakeOrderedAndProject (per-partition heap + driver merge — no global
    sort shuffle), exactly the scalable form of the reference's
    ``sortBy(desc).take(20)`` (``tuto_rdd_pyspark(2).ipynb`` cell 37)."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    return df.orderBy(c.asc() if ascending else c.desc()).limit(k)


def top_k_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k within each group: rank over a window, filter ≤ k.

    Extension beyond the reference surface (it only does global top-k);
    one shuffle on ``keys``, rows stream through WindowExec.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .drop(_RN)
    )
