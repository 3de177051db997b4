"""2-D skyline (Pareto frontier) — an operator Spark lacks natively.

Engine extension (no reference citation — the reference has no ranking
surface beyond sort+take). The naive formulation is a quadratic
dominance anti-join (a non-equi NestedLoop this engine's hygiene gate
bans); the classic distributed algorithm exploits that the skyline
operator is idempotent and distributive over union:

    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))

so phase 1 computes a LOCAL skyline per partition (an Arrow-batched
sort + running-max scan, linear after the sort) and only the few
surviving candidates — skylines are tiny relative to their inputs —
reach phase 2, the same scan over the unioned candidate set in one
task. No shuffle of the base table at all: the only movement is the
candidate union. At 100 TB the phase-1 contraction is the whole story;
phase 2's input is bounded by (partitions × local skyline size).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _local_skyline(pdf: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Exact 2-D skyline of one pandas frame: minimize ``min_col``,
    maximize ``max_col``. Ties on BOTH dims are all kept (neither
    dominates); within an equal ``min_col`` group only the max
    ``max_col`` rows survive (same-group strict dominance)."""
    if len(pdf) == 0:
        return pdf
    # Rows with a NULL/NaN dimension are excluded EXPLICITLY (dominance
    # is undefined for them): pandas groupby would drop NaN group keys
    # silently, which is the same outcome but must be a contract, not
    # an accident.
    pdf = pdf.dropna(subset=[min_col, max_col])
    if len(pdf) == 0:
        return pdf
    pdf = pdf.sort_values([min_col, max_col], ascending=[True, False])
    keep_idx = []
    best = None
    for price, group in pdf.groupby(min_col, sort=True):
        g = group[max_col].iloc[0]
        if best is None or g > best:
            keep_idx.extend(group.index[group[max_col] == g])
            best = g
    return pdf.loc[keep_idx]


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows not dominated by any other row, where q dominates p iff
    q.min_col <= p.min_col AND q.max_col >= p.max_col with at least one
    strict. Exact; keeps all rows tied on both dimensions; rows with a
    NULL in either dimension are excluded (dominance undefined)."""
    cols = df.columns

    def phase(itr):
        for pdf in itr:
            yield _local_skyline(pdf, min_col, max_col)

    def merge(itr):
        # The merge MUST see every candidate at once: coalesce(1) makes
        # one partition, but mapInPandas still splits it into Arrow
        # batches (maxRecordsPerBatch, default 10k) — running the local
        # skyline per batch would let a row dominated by a row in an
        # earlier batch survive. Concatenate the iterator first; the
        # candidate set is partitions × local-skyline-size, small by
        # construction.
        import pandas as pd

        pdfs = [p for p in itr if len(p)]
        if pdfs:
            yield _local_skyline(
                pd.concat(pdfs, ignore_index=True), min_col, max_col
            )

    schema = df.schema
    local = df.mapInPandas(phase, schema)
    # Candidate set is small by construction — one task finishes it.
    return local.coalesce(1).mapInPandas(merge, schema).select(*cols)
