"""Deterministic hash-based sampling — train/test splits and stratified
subsamples for training-data pipelines (engine extension, SURVEY.md §7 M4).

Why not ``df.sample``: Bernoulli sampling is seeded per-partition, so the
selected set changes with partitioning/cluster layout — unacceptable for
a reproducible train/test split over 100 TB. Hash-gating on a stable key
(``bucket(key) < fraction·2^32``) selects the SAME rows regardless of
partitioning, engine, or run, supports disjoint complements (test =
complement of train by construction), and pushes down as an ordinary
filter. The bucket is the first 8 hex chars of ``md5(salt ‖ key)`` —
md5 is bit-identical across Spark and DuckDB, which is what makes these
operators oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable uint32 bucket: first 8 hex chars of md5(salt ‖ key)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * _BUCKETS))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """(train, test): disjoint, covering, reproducible across runs and
    partitionings. Rows with equal keys land on the same side — the
    leakage-safe grouping a by-document split needs."""
    b = hash_bucket(F.col(key_col), salt)
    thr = int(test_fraction * _BUCKETS)
    return df.filter(b >= thr), df.filter(b < thr)


def shuffle_positions(
    df: DataFrame, key_col: str, salt: str = "epoch0", id_col: str = "position"
) -> DataFrame:
    """Deterministic global shuffle order for training-data export:
    every row gets a dense 0..N-1 ``id_col`` under the pseudo-random
    total order (md5 bucket of key, then key). Same salt → same order
    on any cluster/partitioning; vary the salt per epoch for fresh
    shuffles. Positions are assigned by ``ids.assign_contiguous_ids``
    (range-partition + per-partition counts + driver prefix-sum), NOT a
    global row_number window — the naive form funnels the whole corpus
    through one task and cannot run at 100 TB."""
    from esther_apache_spark_spark.operators.ids import assign_contiguous_ids

    keyed = df.withColumn("_shuf", hash_bucket(F.col(key_col), salt))
    out = assign_contiguous_ids(
        keyed, [F.col("_shuf"), F.col(key_col)], id_col=id_col
    )
    return out.drop("_shuf")


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (pandas/Spark ``sampleBy``'s
    job, but stable under repartitioning): each stratum value gets its
    own keep-threshold via a CASE chain, evaluated in one scan."""
    thr: Column = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, int(frac * _BUCKETS)).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col)) < thr)


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture sampling — the multilingual-corpus
    rebalancing rule (sample stratum l at a rate ∝ p_l^α, α<1 upweights
    tail languages; Conneau & Lample 2019): per-stratum keep-rates are
    DERIVED FROM THE DATA in one tiny aggregate (rate_l = n_l^α /
    max_m n_m^α, so the largest stratum keeps everything and smaller
    strata keep relatively more than proportional sampling would),
    then applied as a deterministic hash gate. Every arithmetic step is
    a single IEEE double op (pow, divide, multiply, floor) evaluated in
    a fixed order, so the selected row set is bit-reproducible across
    engines and partitionings — unlike RNG-based `sampleBy`.

    Scale shape: the rate table is #strata rows (broadcast); the gate
    is an ordinary filter over the single scan."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    q = F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    rates = counts.select(strata_col, q.alias("_q"))
    maxq = rates.agg(F.max("_q").alias("_maxq"))
    rates = rates.crossJoin(F.broadcast(maxq)).select(
        strata_col, (F.col("_q") / F.col("_maxq")).alias("_rate")
    )
    thr = F.floor(F.col("_rate") * F.lit(float(_BUCKETS))).cast("long")
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_bucket(F.col(key_col), salt) < thr)
        .drop("_rate")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each row draws a deterministic uniform u from the md5 bucket of its
    key and ranks by ln(u)/w descending — the top ``k`` rows are an
    exact weighted sample without replacement. Deterministic: same
    (keys, weights, salt) → same sample on any cluster or partitioning;
    vary the salt to redraw.

    Rows with non-positive or NULL weight are excluded (they have zero
    inclusion probability). The returned frame adds ``_wkey`` (the
    rounded rank key, kept so oracles and audits can replay the order).

    Scale: one narrow projection + TakeOrderedAndProject — no shuffle
    beyond the top-k tree aggregation, no window. The ln/÷ arithmetic
    is rounded to 6 decimals before ranking (ties broken by key): libm
    log() differs across engines only in the last ulp (~1e-16 rel.), so
    a 1e-6 grid makes a boundary-crossing disagreement ~1e-9 per row —
    the same coarse-log-rounding doctrine as the unigram-LM scores."""
    if k <= 0:
        raise ValueError("k must be positive")
    u = (md5_long_u60(F.col(key_col), salt) + F.lit(1)) / F.lit(float(1 << 60))
    wkey = F.round(F.log(u) / weight, 6)
    return (
        df.filter(weight > 0)
        .withColumn("_wkey", wkey)
        .orderBy(F.col("_wkey").desc(), F.col(key_col))
        .limit(k)
    )


def md5_long_u60(key: Column, salt: str = "") -> Column:
    """60-bit non-negative md5 hash of ``salt ‖ key`` (the
    ``dedup.md5_long`` construction, local to avoid a circular import)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
