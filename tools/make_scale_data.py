#!/usr/bin/env python
"""Generate larger scale factors from the driver's read-only testdata.

The driver ships sf0.001/0.01/0.1 only; scale checkpoints (BASELINE.md)
need ~sf1. This replicates a base SF k times with key-shifted copies:
every key column in replica i gets ``+ i * OFFSET``, and foreign keys
shift by the same replica offset — so each replica is internally
referentially intact and joins neither gain nor lose matches. Dimension
tables that queries treat as fixed-cardinality vocabularies (region,
nation) are NOT replicated. Aggregate results therefore scale ~k× while
per-key densities (orders per customer, lineitems per order) stay at
the base SF's values — the right shape for watching shuffle sizes, AQE
decisions and skew handling grow, which is what the checkpoint is for.

Documents/embeddings replicate VERBATIM (ids shifted, content kept):
k identical copies of every doc is a planted near-dup stress — the LSH
family must absorb k-sized dup clusters while staying within its
hot-bucket bounds.

Usage: python tools/make_scale_data.py [k] [base_dir] [out_dir] [hot_frac]
Defaults: 10 /root/testdata/sf0.1 /tmp/scale/sf1  (≈6M lineitem = sf1)

``hot_frac`` (default 0 = off) plants KEY SKEW in events: that fraction
of event rows (selected by the deterministic ``event_id % 100`` gate,
so replicas stay identical run-to-run) is reassigned to ONE hot
user_id (``HOT_USER``). At 0.5 one key carries ~50% of the table —
the regime where a plain shuffle join puts half the data on one
reducer and AQE's skew-join split / the salted-join operator earn
their keep (r8 planted-skew checkpoint, VERDICT r7 #6). Only
events.user_id is touched; user_id is not a foreign key into any
other table, so referential shape is unchanged.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 100_000_000  # far above any base key
HOT_USER = 424_242_424_242  # planted hot key, far above any shifted id

# Parquet can't split below row-group granularity: DuckDB's default
# ~122k-row groups left sf10's 500k-row documents.parquet with FIVE
# splittable units, capping every downstream Python-kernel stage
# (MinHash signatures, shingling, GEMM) at parallelism 5 on a 32-core
# box — measured as the dominant cost of the first r7 sf10 cold runs.
# Tables whose per-ROW work is heavy get small row groups so scan
# parallelism follows cores; the narrow fact tables keep the default
# (they already produce hundreds of groups at scale).
ROW_GROUP_ROWS = {"documents": 10_000, "embeddings": 10_000}

# key columns to shift per table; every other column is copied verbatim
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale/sf1"
    hot_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{base}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")
    for t, keys in SHIFT.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{base}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + i * {OFFSET} AS {c}" if c in keys else c for c in cols
        )
        if t == "events" and hot_frac > 0:
            # deterministic gate on the PRE-shift event_id so every
            # replica contributes the same fraction; applied after the
            # shift projection below via an outer SELECT
            gate = int(round(hot_frac * 100))
            proj = ", ".join(
                f"CASE WHEN event_id % 100 < {gate} THEN {HOT_USER} "
                f"ELSE user_id + i * {OFFSET} END AS user_id"
                if c == "user_id"
                else (f"{c} + i * {OFFSET} AS {c}" if c in keys else c)
                for c in cols
            )
        rg = (
            f", ROW_GROUP_SIZE {ROW_GROUP_ROWS[t]}" if t in ROW_GROUP_ROWS else ""
        )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{base}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({k})) AS i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET{rg})"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows (x{k})")


if __name__ == "__main__":
    main()
