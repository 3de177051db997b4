"""Distributed k-means (Lloyd) as pure DataFrame algebra — no driver
iteration state, no Python in the hot path, and (deliberately) no
floating-point accumulation anywhere.

Engine extension beyond the reference surface (the reference has no
clustering): the IVF/PQ ANN operators (`similarity.py`) train their
quantizers on a BOUNDED driver-side sample — correct for codebooks,
but not a cluster assignment of the whole corpus. This module is the
complementary full-corpus path: every Lloyd round is expressed as
DataFrame ops over ALL vectors, unrolled a fixed number of times into
one lazy plan, so Catalyst sees the whole computation and the work
runs where the data lives.

Cross-engine determinism (what makes a trained-model op oracle-able):

- vectors are quantized once to integers (``floor(x·scale + 0.5)``,
  exact IEEE ops on parquet-identical floats), so every distance is an
  EXACT BIGINT — no float-sum ordering anywhere;
- argmin tie-breaks on (distance, cluster_id) lexicographically —
  ``array_min`` over structs here, ``row_number() OVER (ORDER BY dist,
  cid)`` in the DuckDB oracle;
- centroid updates round the integer-sum mean back to integers via
  ``floor(sum/count + 0.5)`` — a single correctly-rounded double
  division of exactly-representable integers (sums ≤ n·scale < 2^53);
- per-cluster inertia is an exact BIGINT sum — exact to ~10⁴ worst-case
  vectors/cluster at scale=10⁶ and ~10⁹ at realistic unit-norm
  embeddings; beyond that drop ``scale`` to 10⁴ (see
  ``kmeans_lloyd_summary``'s docstring for the bound arithmetic —
  determinism and the oracle replay don't depend on the setting).

Scale shape per round: the centroid set collapses to ONE row of k
structs (bounded by the model constant k, never by data) that
broadcast-joins onto the vectors — assignment is a map, no shuffle.
The update is a posexplode → partial-aggregable groupBy on
(cluster, dim): the shuffle moves k·dim partial sums per partition,
not vectors. Seeding is the k lowest vec_ids BY RANK (orderBy+limit —
a TakeOrderedAndProject, k rows — with cids 0..k−1 assigned by
row_number over that k-row frame), so any id domain — offset, sparse,
filtered — yields exactly min(n, k) seeds; deterministic and
SQL-replayable (swap in k-means|| offline when quality matters more
than replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, qv: array<long>) — exact integer quantization of a float
    vector column; the shared determinism front for clustering."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("long"),
        ).alias("qv"),
    )


def _sq_dist(qv, cv):
    """Σ_d (qv_d − cv_d)² as an exact BIGINT fold."""
    return F.aggregate(
        F.zip_with(qv, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(q: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector: centroids collapse to a 1-row array
    of k structs (bounded by the model constant k), broadcast onto the
    vectors; argmin is an in-row array_min over (dist, cid) structs —
    lexicographic, so ties break on the lower cluster id."""
    cents1 = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents")
    )
    return q.crossJoin(F.broadcast(cents1)).select(
        "vec_id",
        "qv",
        F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    _sq_dist(F.col("qv"), c["cv"]).alias("dist"),
                    c["cid"].alias("cid"),
                ),
            )
        ).alias("best"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New integer centroids from an assignment: per-(cluster, dim)
    exact BIGINT sums (partial-aggregable — the shuffle carries k·dim
    partials per partition), mean rounded back to integer via one
    correctly-rounded double division."""
    dims = assigned.select(
        F.col("best.cid").alias("cid"), F.posexplode("qv").alias("pos", "v")
    )
    per_dim = dims.groupBy("cid", "pos").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    rounded = per_dim.select(
        "cid",
        "pos",
        F.floor(F.col("s").cast("double") / F.col("n").cast("double") + F.lit(0.5))
        .cast("long")
        .alias("cvd"),
    )
    return rounded.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cvd"))), lambda p: p["cvd"]
        ).alias("cv")
    )


def kmeans_lloyd_summary(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "expr",
) -> DataFrame:
    """``iters`` unrolled Lloyd rounds over the WHOLE corpus; returns
    one row per surviving cluster: (cluster_id, n_vecs, inertia — Σ
    squared integer distance to the assigning centroid — and
    centroid_l1, the L1 norm of the post-update centroid: an exact
    BIGINT fingerprint of the trained model that a SQL oracle replays
    bit-for-bit). Inertia range: per-vector distance ≤ dim·(2·scale·
    max|x|)², so a BIGINT cluster sum is exact to ~10⁴ vectors/cluster
    at worst-case scale=10⁶ inputs and to ~10⁹ at realistic unit-norm
    embeddings; for corpora beyond that, drop ``scale`` to 10⁴ (the
    bound grows 10⁴×; assignment quality for unit vectors is
    unchanged) — determinism and the oracle replay are scale-setting-
    independent.

    ``assign_via``: ``"expr"`` (default) keeps assignment a pure lazy
    column expression — right for small k and for SQL-replay parity;
    ``"arrow"`` swaps in the int64-GEMM ``mapInArrow`` kernel
    (``_assign_arrow``) — bit-identical results (equivalence-tested),
    the right tier once k reaches codebook sizes where the expression
    fold interprets k·dim ops per row."""
    if assign_via not in ("expr", "arrow"):
        raise ValueError(f"unknown assign_via: {assign_via}")
    assign = _assign if assign_via == "expr" else _assign_arrow
    q = quantize_vectors(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    # Seed by RANK, not by value: orderBy+limit is a TakeOrderedAndProject
    # (k rows, bounded by the model constant), and the row_number window
    # runs over that k-row frame only — any id domain (offset, sparse,
    # filtered) yields exactly min(n, k) seeds with cids 0..min(n,k)-1.
    from pyspark.sql import Window

    seeds = q.orderBy("vec_id").limit(k)
    cent = seeds.select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .cast("long")
        .alias("cid"),
        F.col("qv").alias("cv"),
    )
    assigned = None
    for _ in range(iters):
        assigned = assign(q, cent)
        cent = _update(assigned)
    sizes = assigned.groupBy(F.col("best.cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("best.dist").alias("inertia"),
    )
    l1 = cent.select(
        F.col("cid").alias("cluster_id"),
        F.aggregate(
            F.col("cv"), F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("centroid_l1"),
    )
    return sizes.join(l1, on="cluster_id", how="inner")


def _assign_arrow(q: DataFrame, cent: DataFrame) -> DataFrame:
    """Arrow GEMM assignment kernel — bit-identical to ``_assign`` but
    O(k·dim) work per vector runs as one int64 matrix product instead
    of an interpreted higher-order-function fold. The expression path
    wins at small k (stays lazy, SQL-replayable plan); this one wins
    once k reaches the dozens-to-thousands range (codebook-sized),
    where the fold interprets k·dim ops per row. Exactness is
    preserved: the distance identity ‖x‖² + ‖c‖² − 2x·c runs entirely
    in int64 (max |term| ≈ dim·scale² ≈ 2^46 — no float anywhere), and
    np.argmin's first-minimum rule equals the (dist, cid) lexicographic
    tie-break because centroids are sorted by cid. Trade-off: the
    centroid table (k·dim ints — model constants) is collected eagerly
    per round, so the unrolled plan is no longer one lazy tree."""
    import numpy as np
    import pyarrow as pa

    rows = sorted(cent.collect(), key=lambda r: r["cid"])
    if not rows:
        return q.select(
            "vec_id",
            "qv",
            F.struct(
                F.lit(None).cast("long").alias("dist"),
                F.lit(None).cast("long").alias("cid"),
            ).alias("best"),
        ).filter(F.lit(False))
    cids = np.array([r["cid"] for r in rows], dtype="int64")
    C = np.array([r["cv"] for r in rows], dtype="int64")
    c_sq = (C * C).sum(axis=1)

    def scan(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy()
            varr = batch.column(1)
            if len(ids) == 0:
                continue
            X = np.asarray(
                varr.flatten().to_numpy(zero_copy_only=False), dtype="int64"
            ).reshape(len(ids), C.shape[1])
            d = (X * X).sum(axis=1)[:, None] + c_sq[None, :] - 2 * (X @ C.T)
            j = np.argmin(d, axis=1)  # first min == lowest cid (sorted)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    batch.column(1),
                    pa.array(d[np.arange(len(ids)), j], pa.int64()),
                    pa.array(cids[j], pa.int64()),
                ],
                names=["vec_id", "qv", "dist", "cid"],
            )

    flat = q.select("vec_id", "qv").mapInArrow(
        scan, "vec_id long, qv array<long>, dist long, cid long"
    )
    return flat.select(
        "vec_id", "qv", F.struct(F.col("dist"), F.col("cid")).alias("best")
    )
