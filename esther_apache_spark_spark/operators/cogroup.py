"""Cogrouped Arrow kernels — ``groupBy().cogroup().applyInPandas``.

The last uncovered piece of the Pandas-UDF surface (SURVEY.md §2.10 D3):
two relations grouped on the same key, each group pair handed to one
Python kernel as a pair of pandas DataFrames. Spark co-shuffles both
sides on the key (one Exchange each, same partitioning — no join
materialization in between), so at 100 TB the kernel sees exactly one
(events-of-user, orders-of-user) pair per key with no skewed
wide-row intermediate.

When to use vs a join: a join + groupBy expresses the same result when
the combine logic is algebraic (sums, counts — Catalyst then does
partial aggregation map-side, which is strictly better). Cogroup is for
kernels that genuinely need BOTH full groups at once — sequence
alignment, per-key model fits, custom merge policies. The catalog query
uses an algebraic combine precisely so DuckDB can oracle the cogroup
machinery end-to-end (full-outer-join-of-groupbys semantics).

Money note: values accumulate in integer cents inside the kernel (exact
for 2-decimal money, order-independent) and convert to double at emit,
matching functions/money.py doctrine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = (
    "user_id long, n_events long, events_value double, "
    "n_orders long, orders_total double"
)


def _cents(series: pd.Series) -> int:
    """Exact integer-cent sum of a 2-decimal money column."""
    if len(series) == 0:
        return 0
    return int((series * 100).round().astype("int64").sum())


def user_activity_cogroup(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-user merge of event history and order history in one cogrouped
    kernel: (n_events, sum value) ⊕ (n_orders, sum o_totalprice), one
    output row per user present on EITHER side (full-outer semantics —
    cogroup invokes the kernel even when one side's group is empty).

    Scale: both sides shuffle once on the key; group pairs stream
    through Arrow batches. Per-user data is bounded (a user's events
    fit in memory by assumption); no collect, no cartesian.
    """

    def merge(key: tuple, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(ev)],
                "events_value": [_cents(ev["value"]) / 100.0],
                "n_orders": [len(od)],
                "orders_total": [_cents(od["o_totalprice"]) / 100.0],
            }
        )

    ev = events.select("user_id", "value")
    od = orders.select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(merge, _SCHEMA)
    )
