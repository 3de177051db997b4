"""Deduplication operators — exact and near-duplicate (SURVEY.md §7 M4).

Engine extension for training-data pipelines at 100 TB. The exact path
is the reference's W1 dedup generalized; the near-dup family (MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine) follows the published
MinHash/LSH construction (Broder 1997; Leskovec-Rajaraman-Ullman ch.3)
expressed entirely in built-in Spark expressions — hashing, banding and
bucket-joins all JVM-side, no Python worker in the hot path.

Scale notes:
- Candidate generation is a self-equi-join on (band, bucket) — a normal
  shuffle join Spark can plan; no all-pairs comparison ever happens.
- Hot buckets (boilerplate docs) make the candidate join / rerank
  quadratic in the bucket size. Every bucketed operator therefore caps
  bucket size deterministically (``max_bucket``): buckets larger than
  the cap are split into ``ceil(size/max_bucket)`` shards on a
  band-salted id hash, bounding per-task pair counts at
  O(max_bucket²). The salt varies per band/table, so a boilerplate
  cluster shards differently in every band and stays connected for
  downstream connected-components dedup (each doc still pairs with
  ~bands·max_bucket neighbors); only the marginal all-pairs recall
  inside mega-clusters is given up. Pass ``max_bucket=None`` to disable.
- Signatures are fixed-width arrays (num_perm longs), so the shuffle
  payload per doc is O(num_perm), independent of doc size.
- The ``.cache()`` calls are load-bearing: they are plan barriers that
  keep Arrow-batched UDFs out of generator operators AND the relation
  both sides of the self-join reuse. They are not unpersisted eagerly
  (results are lazy — the frames are still needed when the caller
  materializes). For a single query per session that is fine (executor
  storage is reclaimed at session end); a pipeline composing SEVERAL
  dedup passes in one long-lived session should wrap each pass in
  ``cache_scope()``, which unpersists every frame the pass cached as
  the scope exits — materialize results INSIDE the scope::

      with cache_scope():
          pairs = minhash_lsh_candidates(docs)
          pairs.write.parquet(out)      # materialized in-scope
      # executor storage for this pass is freed here

  (``spark.catalog.clearCache()`` remains the blunt whole-session
  fallback.)
"""

from __future__ import annotations

import contextlib
import re
from contextvars import ContextVar

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.functions.text import (
    char_ngrams,
    shingle_hashes,
    tokenize,
    word_shingles,
)
from esther_apache_spark_spark.operators.windows import keep_first

# --- cache lifecycle -------------------------------------------------------
# Every plan-barrier cache in this module registers with the active
# cache_scope (if any), so composed pipelines can free executor storage
# per pass instead of accumulating it until eviction thrashes.
_active_cache_scope: ContextVar[list | None] = ContextVar(
    "_dedup_cache_scope", default=None
)

#: Session-wide override for the plan-barrier caches' storage level
#: (VERDICT r06 #6, reference tuto_rdd_pyspark(2).ipynb cells 33-35's
#: ``persist(StorageLevel.*)``). ``None`` keeps ``DataFrame.cache()``'s
#: default — which for Spark SQL is already MEMORY_AND_DISK
#: (deserialized), the right 100 TB default: a cached frame larger than
#: executor memory spills instead of thrashing eviction. Set e.g.
#: ``StorageLevel.DISK_ONLY`` for data-sized intermediates on
#: memory-tight clusters, or ``MEMORY_AND_DISK_DESER``-family levels
#: with replication for hot shared dims.
_default_storage_level: ContextVar = ContextVar(
    "_dedup_storage_level", default=None
)


@contextlib.contextmanager
def storage_level_scope(level):
    """Run a block with every dedup plan-barrier cache persisted at
    ``level`` (a ``pyspark.StorageLevel``) instead of the
    MEMORY_AND_DISK default — the DataFrame-world exposure of the
    reference's RDD ``persist(StorageLevel)`` tutorial surface."""
    token = _default_storage_level.set(level)
    try:
        yield
    finally:
        _default_storage_level.reset(token)


def _cache(df: DataFrame, level=None) -> DataFrame:
    """``df.cache()``/``df.persist(level)`` that enrolls the frame in
    the active cache_scope. Level resolution: explicit arg, else the
    ambient ``storage_level_scope``, else ``cache()``'s default
    (MEMORY_AND_DISK deserialized)."""
    level = level if level is not None else _default_storage_level.get()
    df = df.cache() if level is None else df.persist(level)
    scope = _active_cache_scope.get()
    if scope is not None:
        scope.append(df)
    return df


@contextlib.contextmanager
def cache_scope():
    """Scope the plan-barrier caches of the dedup operators.

    Frames cached by any dedup operator called inside the ``with`` block
    are unpersisted when the block exits — materialize results inside
    the scope (see module docstring). Scopes nest: each scope frees only
    the frames cached while it was the innermost one. Caveat: Spark's
    CacheManager keys entries by analyzed plan, so two scopes running an
    operator over the IDENTICAL input share one entry — the first scope
    to exit unpersists it for both. Distinct passes over distinct inputs
    (the composed-pipeline case this exists for) are unaffected. Without
    a scope, behavior is unchanged (caches live until session end or
    ``spark.catalog.clearCache()``)."""
    frames: list[DataFrame] = []
    token = _active_cache_scope.set(frames)
    try:
        yield
    finally:
        _active_cache_scope.reset(token)
        for df in frames:
            df.unpersist()


def _spread_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin-spread a provably-narrow scan before a token-heavy
    pass (guide §2.5, input skew: "one huge unsplittable file ...
    repartition immediately after the read"). Parquet cannot split
    below row-group granularity, so a small single-row-group file (the
    shape of the driver's testdata tables) runs every scan-fused token
    pipeline single-threaded no matter the core count.

    The gate is DRIVER-SIDE ONLY (no job, no AQE materialization):
    Catalyst's optimized-plan size estimate plus the scan's file list.
    Spread fires only when the input is a single sub-maxPartitionBytes
    file — the one layout that cannot be split wider by
    ``files.minPartitionNum`` — so the shuffle it adds is bounded by
    one split (~128 MB) and the rule is inert at corpus scale (many
    files / large files keep their scan layout). Round-robin
    repartition is retry-safe (sortBeforeRepartition is on) and every
    consumer below is keyed aggregation, so results are unaffected.
    Measured on dedup_substring_spans at sf0.1: 2.22 -> 1.52 s warm.
    Falls back to the input unchanged if the estimate is unavailable
    (non-scan plans, exotic sources)."""
    try:
        sess = df.sparkSession
        cores = sess.sparkContext.defaultParallelism
        files = df.inputFiles()
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — best-effort probe, never fail the query
        return df
    if 0 < len(files) < cores and size < 134217728:
        return df.repartition(cores)
    return df


def _non_null_text(df: DataFrame, text_col: str) -> DataFrame:
    """Exclude NULL-text rows from similarity pipelines: a NULL document
    has no shingle set, and hashing it would silently alias it with the
    empty string (every NULL would pair with every empty doc). Empty
    strings are kept — they are real, deterministic content."""
    return df.filter(F.col(text_col).isNotNull())


def _non_null_vec(df: DataFrame, vec_col: str) -> DataFrame:
    """Exclude NULL vectors and vectors with NULL elements: cosine is
    undefined for them, and a ragged batch would kill the GEMM kernels
    mid-job at scale. Mirrors the kernels' zero-norm exclusion."""
    from esther_apache_spark_spark.functions.vector import is_valid_vector

    return df.filter(is_valid_vector(F.col(vec_col)))


def exact_dedup(df: DataFrame, on: str | list[str], keep_by: list[Column] | None = None) -> DataFrame:
    """Exact dedup: keep one row per key set.

    With ``keep_by`` the choice is deterministic (W1 keep-first); without,
    a plain hash aggregate ``dropDuplicates`` (nondeterministic winner,
    cheapest plan — one shuffle, map-side partial agg)."""
    keys = [on] if isinstance(on, str) else list(on)
    if keep_by is None:
        return df.dropDuplicates(keys)
    return keep_first(df, keys, keep_by)


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by content hash: (text_hash, keep_id, n_dups).

    Hashes the content (md5) so the aggregate shuffles 16-byte keys, not
    document bodies — at 100 TB the difference between shuffling hashes
    and shuffling the corpus."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


_LONG_MAX = 9223372036854775807


def _hot_nsh_arr(
    exploded: DataFrame,
    id_col: str,
    band_col: str,
    bucket_col: str,
    nbands: int,
    max_bucket: int,
) -> DataFrame:
    """Per-id shard-modulus array for hot-bucket sharding:
    ``_nsh_arr[b] = ceil(bucket_size / max_bucket)`` for the id's
    band-``b`` bucket, 1 when the bucket is at or under the cap.

    ``shard(id, b) = xxhash64(id, b) % nsh_arr[b]`` then bounds every
    banded self-join group at ``max_bucket`` expected rows; salting the
    hash with the band id makes each band shard a hot cluster
    differently, which is what keeps mega-clusters connected across
    bands. Carrying the WHOLE array on each row (not just the current
    band's modulus) is what lets the pair filter replay the join's meet
    condition for every band — see the first-meet-band comments at the
    call sites.

    Only over-cap buckets are materialized: the size aggregation is
    map-side combinable, the ``> max_bucket`` filter leaves a frame that
    is empty on healthy data (AQE turns both joins into empty
    broadcasts), and only ids touching a hot bucket reach the per-id
    aggregation. Consumers left-join the result and coalesce missing ids
    to all-ones, so the capped plan is byte-identical to the uncapped
    plan on non-pathological data.

    Expressions are assembled as SQL strings (r11, guide §4 driver
    side): the former Column-builder form cost ~40 py4j round-trips per
    call and this helper sits on every LSH plan build (3 headline
    queries pay it inside their timed region)."""
    mb = int(max_bucket)
    hot = (
        exploded.groupBy(band_col, bucket_col)
        .agg(F.expr("count(1)").alias("_n"))
        .filter(f"_n > {mb}")
        .selectExpr(
            band_col,
            bucket_col,
            f"cast(ceil(_n / {mb}) as bigint) AS _nsh",
        )
    )
    return (
        exploded.join(hot, [band_col, bucket_col])
        .groupBy(id_col)
        .agg(
            F.expr(
                f"map_from_entries(collect_list(struct({band_col}, _nsh)))"
            ).alias("_m")
        )
        .selectExpr(
            id_col,
            f"transform(sequence(0, {nbands - 1}), "
            "b -> coalesce(try_element_at(_m, b), cast(1 as bigint))) AS _nsh_arr",
        )
    )


def _with_shards(src: DataFrame, nsh: DataFrame | None, nbands: int) -> DataFrame:
    """Left-join the hot-bucket modulus arrays onto ``src`` (all-ones for
    ids that touch no hot bucket, or when sharding is disabled)."""
    if nsh is not None:
        src = src.join(nsh, "_id", "left")
    else:
        src = src.withColumn("_nsh_arr", F.expr("cast(null as array<bigint>)"))
    return src.withColumn(
        "_nsh_arr",
        F.expr(
            f"coalesce(_nsh_arr, array_repeat(cast(1 as bigint), {nbands}))"
        ),
    )


def _shard_arr(src: DataFrame, shard_hash_sql, nbands: int) -> DataFrame:
    """Materialize every band's shard value ONCE per row as ``_sh_arr``
    (0 on the all-ones modulus — no hot bucket — else the exact join-key
    shard formula). The banded join key reads its element, and the
    first-meet-band pair filter compares elements instead of re-deriving
    shard hashes per candidate pair. ``shard_hash_sql(id_expr, band)``
    returns a SQL fragment; the whole array is ONE ``F.expr`` (one py4j
    round-trip instead of ~10 per band — see ``_md5_long_sql``)."""
    elems = ", ".join(
        f"CASE WHEN element_at(_nsh_arr, {b + 1}) = 1 THEN CAST(0 AS BIGINT) "
        f"ELSE pmod({shard_hash_sql('_id', b)}, element_at(_nsh_arr, {b + 1})) END"
        for b in range(nbands)
    )
    return src.withColumn("_sh_arr", F.expr(f"array({elems})")).drop("_nsh_arr")


def minhash_signature(
    tokens: Column, num_perm: int = 32, shingle_n: int | None = None
) -> Column:
    """array<string> -> array<bigint> MinHash signature.

    Permutation i is simulated by re-hashing a per-element base hash with
    the permutation index — ``xxhash64(xxhash64(element), i)`` — the
    standard seeded-hash construction (Broder 1997); the signature
    element is the min over the set.

    Built as ONE pass over the elements: each element is string-hashed
    once, then folded into a running array of per-permutation minima via
    ``aggregate``+``zip_with``. The naive form (num_perm separate
    ``transform``s over the shingle expression) re-evaluates the
    tokenize→shingle→string-hash subtree per permutation — measured 65×
    slower at sf0.1 because higher-order functions are interpreted, not
    codegen'd."""
    if shingle_n:
        # shingle hashes directly from token hashes — no shingle strings
        base = F.array_distinct(shingle_hashes(tokens, shingle_n))
    else:
        base = F.transform(F.array_distinct(tokens), lambda e: F.xxhash64(e))
    perm_idx = F.sequence(F.lit(0), F.lit(num_perm - 1))
    acc0 = F.array_repeat(F.lit(_LONG_MAX).cast("long"), num_perm)
    return F.aggregate(
        base,
        acc0,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(perm_idx, lambda i: F.xxhash64(h, i)),
            lambda a, b: F.least(a, b),
        ),
    )


# Fixed odd ~2^29 position weights for the md5-family shingle combine:
# shingle_hash = Σ_j (token_hash_j & (2^30-1))·C[2j] + (token_hash_j >> 30)·C[2j+1].
# Small enough that every term is < 2^60 and any ≤5-gram sum < 2^63
# (exact signed-64-bit in Spark under ANSI and in DuckDB BIGINT), large
# and position-distinct enough that permuted/shifted shingles hash apart.
SHINGLE_COMBINE = (
    536870909, 536870923, 536870951, 536870969, 536871001, 536871017,
    536871029, 536871043, 536871059, 536871061,
)

# Same construction for the k-gram SPAN hash (substring_dup_spans),
# with ~2^27 weights so even k=12 (24 terms, each < 2^58) sums < 2^63 —
# exact signed-64-bit in Spark under ANSI and in DuckDB BIGINT.
SPAN_COMBINE = tuple(
    134217689 + 2 * d
    for d in (
        0, 7, 19, 34, 40, 45, 52, 63, 70, 75, 82, 88,
        97, 102, 109, 115, 122, 127, 134, 144, 150, 157, 163, 170,
    )
)


def md5_long(col: Column, salt: str = "", hexlen: int = 15) -> Column:
    """Seeded positive ``4·hexlen``-bit hash via md5 — bit-identical in
    Spark and DuckDB (``CAST(CONCAT('0x', substr(md5(x), 1, hexlen)) AS
    BIGINT)``), the same construction as ``sampling.hash_bucket`` /
    ``sketches.cms_slot`` widened to 60 bits. This is the hash family
    that makes the LSH operators SQL-replayable end-to-end; xxhash64
    stays available as the cheaper non-replayable default."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, hexlen), 16, 10).cast("long")


def _md5_long_sql(expr: str, salt: str = "", hexlen: int = 15) -> str:
    """``md5_long`` as a SQL fragment — used by the band/shard expression
    builders that assemble one ``F.expr`` string instead of nesting
    Column objects (every Column call is a py4j round-trip; the unrolled
    per-band loops cost 1.5-2 s of driver wall PER PLAN BUILD at r10,
    measured on dedup_minhash_lsh).

    INTERNAL-ONLY contract (ADVICE r10): ``salt`` is interpolated into a
    SQL string literal with no escaping, and ``expr`` must be a SQL
    expression the caller already controls. Every in-repo salt is a
    fixed ``[A-Za-z0-9:_-]`` literal; the assert keeps a future caller
    from smuggling a quote and getting a parse error far from the
    cause."""
    if salt and not re.fullmatch(r"[A-Za-z0-9:_\-]*", salt):
        raise ValueError(f"_md5_long_sql salt must match [A-Za-z0-9:_-]*: {salt!r}")
    s = f"concat('{salt}', {expr})" if salt else expr
    return f"cast(conv(substr(md5({s}), 1, {hexlen}), 16, 10) as bigint)"


def minhash_perm_constants(
    num_perm: int, seed: int = 7, a_bits: int = 64
) -> tuple["np.ndarray", "np.ndarray"]:
    """The (a_i, b_i) multiply-shift permutation constants shared by the
    vectorized signature fold and (for the md5 family) the DuckDB oracle
    literals. ``a_bits=64`` reproduces the legacy xxhash64-era family
    byte-for-byte; ``a_bits=62`` keeps a_i < 2^62 so a_i·x with a 60-bit
    md5 base hash stays < 2^122 — exactly representable in DuckDB's
    HUGEINT, making ``(a·x + b) mod 2^63`` replayable in SQL."""
    rng = np.random.default_rng(seed)
    if a_bits >= 64:
        a = (rng.integers(0, 2**63, num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    else:
        a = (
            rng.integers(0, 2 ** (a_bits - 1), num_perm, dtype=np.uint64)
            << np.uint64(1)
        ) | np.uint64(1)
    b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature_vec(
    base_hashes: Column, num_perm: int = 32, seed: int = 7, mask_bits: int | None = None
) -> Column:
    """Vectorized fast path for ``minhash_signature``: takes the
    JVM-computed base hashes (``array<bigint>``, e.g. ``shingle_hashes``)
    and folds the per-permutation minima in NumPy via one Arrow batch.

    The permutation family differs from the expression form —
    ``(a_i·x + b_i) mod 2^64`` with odd ``a_i`` (a true permutation of
    Z_2^64, multiply-shift style) instead of re-seeded ``xxhash64`` —
    so signatures are not byte-identical to ``minhash_signature``, but
    the estimator property (P[sig_i(A)=sig_i(B)] = Jaccard(A,B)) is the
    same and is what the property tests assert. Interpreted HOF folds
    cost O(num_perm·|set|) per row; the GEMM-ish batch form is ~4×
    faster end-to-end at sf0.1.

    ``mask_bits=63`` switches to the SQL-replayable md5 family:
    constants from ``minhash_perm_constants(a_bits=62)`` and the fold
    masked to the low 63 bits — (a·x + b) mod 2^63, which DuckDB
    replays exactly in HUGEINT because mod 2^63 of the uint64-wrapped
    product equals mod 2^63 of the true product (2^63 | 2^64). Values
    stay non-negative, so signed BIGINT min agrees with the unsigned
    min on both engines."""
    a, b = minhash_perm_constants(
        num_perm, seed, a_bits=62 if mask_bits is not None else 64
    )
    if mask_bits is not None:
        mask = np.uint64(2**mask_bits - 1)
        empty = np.full(num_perm, 2**mask_bits - 1, dtype=np.int64)
    else:
        mask = None
        empty = np.full(num_perm, _LONG_MAX, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sig(s: pd.Series) -> pd.Series:
        out = []
        for arr in s:
            if arr is None:
                out.append(None)
                continue
            x = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if len(x) == 0:
                out.append(empty)
                continue
            v = x[None, :] * a[:, None] + b[:, None]  # uint64 wraparound
            if mask is not None:
                v &= mask
            out.append(v.min(axis=1).view(np.int64))
        return pd.Series(out, dtype=object)

    return _sig(base_hashes)


def simhash_vec(token_hashes: Column, bits: int = 64) -> Column:
    """Vectorized twin of ``simhash``: takes JVM-computed 64-bit token
    hashes (``transform(tokens, xxhash64)``) and does the 64-bit-position
    vote accumulation in NumPy. Bit rule is identical (bit set iff vote
    sum >= 0, bit 63 wraps like Java shiftleft), so fingerprints are
    byte-identical to the expression form — asserted in tests.

    ``bits=60`` is the SQL-replayable md5 family: token hashes from
    ``md5_long`` carry 60 informative bits, and the 60-bit fingerprint
    stays non-negative — no Java sign wrap, so DuckDB can rebuild it
    with plain ``<<``/``>>``/``&`` BIGINT arithmetic."""
    shifts = np.arange(bits, dtype=np.uint64)
    all_set = -1 if bits == 64 else (1 << bits) - 1

    @F.pandas_udf("long")
    def _fp(s: pd.Series) -> pd.Series:
        out: list[int | None] = []
        for arr in s:
            if arr is None:
                out.append(None)
                continue
            x = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if len(x) == 0:
                out.append(all_set)  # zero votes at every bit -> all bits set
                continue
            bits = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            setbits = np.uint64(1) << shifts[votes >= 0]
            fp = np.bitwise_or.reduce(setbits, initial=np.uint64(0), dtype=np.uint64)
            out.append(int(np.asarray([fp], dtype=np.uint64).view(np.int64)[0]))
        return pd.Series(out, dtype=object)

    return _fp(token_hashes)


# Auto-collapse threshold (VERDICT r7 #1): the pair-level APIs default
# to collapse_exact="auto" — a one-aggregate dup-mass probe flips the
# clone-collapse front end on when ≥ this fraction of rows are exact
# content duplicates. The r7 sf10 checkpoint measured the direct pair
# paths at 73× (embedding) / 4× (simhash) the collapsed cost on a
# 100-deep-clone corpus (dup mass 0.99), while clone-light corpora
# (bench sf0.1: dup mass 0.0016) pay ~1.6× for collapse they don't
# need — the regimes sit decades apart, so any threshold in [0.05,
# 0.5] separates them; 0.10 leaves ~2× margin over the HLL probe's
# ~5% relative error on a fully-distinct corpus.
AUTO_COLLAPSE_DUP_MASS = 0.10

# Probe memo keyed by (analyzed-plan semanticHash, content-key kind):
# the probe is one narrow count+HLL aggregate (partial-aggregated, no
# wide shuffle — ~the cost of a count(*) over the key column), and the
# memo keeps repeated calls on the SAME source (warm bench medians,
# multi-op pipelines over one corpus) from re-running it. Bounded;
# cleared wholesale when full.
_AUTO_PROBE_CACHE: dict[tuple[int, str], bool] = {}

# Steady-state accounting for the probe (VERDICT r8 #3): bench.py
# snapshots this around each query and reports per-query probe_ms +
# memo hit/miss deltas, so a warm-median drift can be attributed to
# the probe (misses inside timed runs) or ruled out (all hits).
AUTO_PROBE_STATS = {"hits": 0, "misses": 0, "probe_sec": 0.0}


def _resolve_collapse_exact(df: DataFrame, key: Column, collapse_exact, kind: str) -> bool:
    """Resolve the tri-state ``collapse_exact`` knob: True/False pass
    through; ``"auto"`` probes the corpus's exact-duplicate mass
    (1 − approx_count_distinct(content key)/count — ONE aggregate over
    the key expression, HLL-sketched so the shuffle is bytes, not keys)
    and enables the clone-collapse front end at ≥
    ``AUTO_COLLAPSE_DUP_MASS``. This is the AQE-style posture for the
    measured sf10 scale-killer: a d-deep verbatim clone cluster costs
    the direct candidate paths O(d²) while the probe costs one narrow
    scan — at 100 TB the scan is noise and the d² blowup is fatal."""
    if collapse_exact != "auto":
        return bool(collapse_exact)
    ck = None
    try:
        ck = (df.semanticHash(), kind)
        hit = _AUTO_PROBE_CACHE.get(ck)
        if hit is not None:
            AUTO_PROBE_STATS["hits"] += 1
            return hit
    except Exception:  # noqa: BLE001 — memo is an optimization only
        pass
    import time as _time

    _t0 = _time.perf_counter()
    row = df.agg(
        F.count(F.lit(1)).alias("_n"), F.approx_count_distinct(key).alias("_d")
    ).first()
    AUTO_PROBE_STATS["misses"] += 1
    AUTO_PROBE_STATS["probe_sec"] += _time.perf_counter() - _t0
    n = int(row["_n"] or 0)
    mass = 0.0 if n == 0 else max(0.0, 1.0 - int(row["_d"]) / n)
    decision = mass >= AUTO_COLLAPSE_DUP_MASS
    if ck is not None:
        if len(_AUTO_PROBE_CACHE) > 256:
            _AUTO_PROBE_CACHE.clear()
        _AUTO_PROBE_CACHE[ck] = decision
    return decision


def _collapse_identical_text(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(groups, members) for exact-text collapse: one representative row
    (min id) per distinct text, plus the narrow (_tkey, _mid) member
    map. Identical texts produce identical signatures, fingerprints and
    buckets in every LSH scheme in this module, so running candidate
    generation on representatives and expanding afterwards preserves
    the pair set exactly while cutting the quadratic bucket work by the
    square of the clone-cluster depth (see embedding_cosine_dups, where
    the same collapse measured 2.6× end-to-end on 10-deep clusters).
    Both frames are cached per the module cache doctrine."""
    keyed = df.select(F.col(id_col).alias("_cid"), F.col(text_col).alias("_ct"))
    keyed = keyed.withColumn("_tkey", F.md5(F.coalesce(F.col("_ct"), F.lit(""))))
    members = _cache(keyed.select("_tkey", F.col("_cid").alias("_mid")))
    groups = _cache(
        keyed.groupBy("_tkey")
        .agg(F.min("_cid").alias(id_col), F.first("_ct").alias(text_col))
    )
    return groups, members


def _expand_collapsed_pairs(
    rep_pairs: DataFrame,
    groups: DataFrame,
    members: DataFrame,
    id_col: str,
    intra_cols: dict[str, Column],
    key_col: str = "_tkey",
    cap: int | None = None,
    intra_members: DataFrame | None = None,
) -> DataFrame:
    """Expand representative pairs to member pairs (cross-group), plus
    intra-group pairs with the exact scores identical inputs earn
    (``intra_cols``, e.g. sig_agreement 1.0 / hamming 0 / cosine 1.0).

    ``cap`` (wired to the operators' ``max_bucket``) keeps the expansion
    from reintroducing the O(cluster²) OUTPUT the hot-bucket shards
    exist to prevent: groups at or under the cap expand to their full
    exact pair set; bigger groups are chunked by member rank into
    cap-sized cliques joined by a chain of connector edges — bounded
    per-member degree (≈ cap), linear total pairs, and the cluster stays
    one connected component for downstream connected-components dedup
    (the same contract the sharded direct path delivers, with a cheaper,
    deterministic structure). Cross-group pairs expand over each group's
    first ``cap`` members by the same rule — exact below the cap,
    bounded and connected above it. ``cap=None`` → complete exact
    expansion. The rank window sorts one partition per group; a
    mega-group's sort spills rather than OOMs (ids only, no payload).
    ``intra_members`` narrows which members may form intra pairs (e.g.
    zero-norm exclusion for cosine)."""
    extra = [c for c in rep_pairs.columns if c not in ("id_a", "id_b")]
    ivals = [v.alias(k) for k, v in intra_cols.items()]
    rep_map = groups.select(F.col(id_col).alias("_rep"), key_col)

    if cap is not None:
        w = Window.partitionBy(key_col).orderBy("_mid")
        head = (
            members.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
    else:
        head = members
    memb = head.join(rep_map, key_col).select("_rep", "_mid")
    ma = memb.select(F.col("_rep").alias("id_a"), F.col("_mid").alias("_ma"))
    mb = memb.select(F.col("_rep").alias("id_b"), F.col("_mid").alias("_mb"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("_ma", "_mb").alias("id_a"),
            F.greatest("_ma", "_mb").alias("id_b"),
            *extra,
        )
    )

    im = intra_members if intra_members is not None else members
    if cap is None:
        ia = im.select(key_col, F.col("_mid").alias("_ia"))
        ib = im.select(key_col, F.col("_mid").alias("_ib"))
        intra = (
            ia.join(ib, key_col)
            .filter(F.col("_ia") < F.col("_ib"))
            .select(
                F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"), *ivals
            )
        )
    else:
        w = Window.partitionBy(key_col).orderBy("_mid")
        ranked = im.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_chunk", F.floor((F.col("_rn") - 1) / cap)
        )
        ia = ranked.select(key_col, "_chunk", F.col("_mid").alias("_ia"))
        ib = ranked.select(key_col, "_chunk", F.col("_mid").alias("_ib"))
        cliques = (
            ia.join(ib, [key_col, "_chunk"])
            .filter(F.col("_ia") < F.col("_ib"))
            .select(
                F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"), *ivals
            )
        )
        leads = ranked.filter((F.col("_rn") - 1) % cap == 0).select(
            key_col, "_chunk", F.col("_mid").alias("_lead")
        )
        nxt = leads.select(
            key_col,
            (F.col("_chunk") - 1).alias("_chunk"),
            F.col("_lead").alias("_lead_next"),
        )
        connectors = leads.join(nxt, [key_col, "_chunk"]).select(
            F.least("_lead", "_lead_next").alias("id_a"),
            F.greatest("_lead", "_lead_next").alias("id_b"),
            *ivals,
        )
        intra = cliques.unionByName(connectors)
    return cross.unionByName(intra)


def _quotient_labels(
    rep_pairs: DataFrame,
    groups: DataFrame,
    members: DataFrame,
    id_col: str,
    key_col: str,
    intra_members: DataFrame | None = None,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Member-level component labels ``(node, comp)`` computed on the
    QUOTIENT graph — identical to ``connected_components(
    _expand_collapsed_pairs(rep_pairs, ...))`` at any ``cap``, without
    materializing a single expanded edge.

    Why this is sound: expansion preserves the component structure by
    contract (each group's intra members form one connected blob via
    cap-chunked cliques + connector chains; cross edges connect groups
    exactly where a representative pair exists), so components of the
    expanded member graph are unions of whole groups over components of
    the REP graph (nodes = groups, edges = ``rep_pairs``), plus one
    self-component per edge-free group with ≥ 2 intra members. Labels
    are min member ids, and each group's representative IS its min
    member id (``_collapse_identical_*`` builds groups with
    ``F.min(id)``), so the member label = min rep id over the quotient
    component — precisely what ``connected_components`` over
    ``rep_pairs`` yields.

    Scale shape — the reason this function exists: the survivor-family
    consumers only need LABELS, and at the r8 sf10 checkpoint the
    expanded edge set they fed through connected components was 18.16M
    rows (100-deep clone clusters) while the quotient graph has one
    node per DISTINCT content. The iterative stage shrinks by the
    clone depth squared; the member map is touched once, in the final
    linear join.

    Contract (all call sites satisfy it by construction): intra
    eligibility is a PER-KEY property — ``intra_members`` is a
    key-level semijoin of ``members`` (a group's members are all
    present or all absent), true for text collapse (≥ 1 kept shingle
    is a property of the text) and vector collapse (nonzero norm is a
    property of the vector), because members of a group are
    byte-identical content. The contract is otherwise structural
    (ADVICE r8): a group connected by ``rep_pairs`` cross edges keeps
    its rep-graph label and labels its FULL member set regardless of
    intra eligibility — mirroring ``_expand_collapsed_pairs``, which
    expands cross pairs over the full member map and suppresses only
    intra pairs — so a degenerate config (e.g. cosine threshold > 1.0
    with ``intra_members`` empty) can no longer silently unlabel
    cross-edge-derived components."""
    from esther_apache_spark_spark.operators.components import (
        connected_components,
    )

    im = intra_members if intra_members is not None else members
    rep_lab = connected_components(
        rep_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    ).withColumnRenamed("node", "_rep")
    gsz = im.groupBy(key_col).agg(F.count(F.lit(1)).alias("_gn"))
    glab = (
        groups.select(F.col(id_col).alias("_rep"), key_col)
        .join(gsz, key_col, "left")
        .join(rep_lab, "_rep", "left")
        # edge-connected groups keep the rep-graph label (never gated
        # on intra eligibility — left join + coalesce(_gn, 0));
        # edge-free groups are their own cluster when ≥ 2 identical
        # INTRA-ELIGIBLE members exist (the expanded path's intra-only
        # component); edge-free singletons have no edges in the
        # expanded graph either — drop.
        .filter(
            F.col("comp").isNotNull() | (F.coalesce("_gn", F.lit(0)) >= 2)
        )
        .select(key_col, F.coalesce("comp", "_rep").alias("comp"))
    )
    # Final member join over the FULL map: cross-labeled groups label
    # every member (matching the expanded path's cross expansion); for
    # edge-free fallback groups the per-key contract makes this
    # identical to joining intra_members.
    return members.join(glab, key_col).select(F.col("_mid").alias("node"), "comp")


def _mh_shard_hash_fn(hash_family: str):
    """Per-(id, band) shard hash for hot-bucket sharding as a SQL
    fragment builder ``(id_expr: str, band: int) -> str``, in the given
    hash family (md5 = SQL-replayable, xxhash64 = fast path). Same
    values as the former Column builder: the md5 family hashes
    ``'shard:' || id || ':' || band``; xxhash64 hashes (id, band) with
    the band as an int literal, exactly like ``F.lit(band)``."""

    def shard_hash_sql(id_expr: str, band: int) -> str:
        if hash_family == "md5":
            return _md5_long_sql(
                f"concat_ws(':', cast({id_expr} as string), '{band}')",
                salt="shard:",
            )
        return f"xxhash64({id_expr}, {band})"

    return shard_hash_sql


def shingle_base_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int | None = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-doc distinct shingle-hash set ``(_id, _base)`` — the shared
    base of every MinHash consumer (``minhash_band_frame``) and of
    exact-Jaccard auditing (``lsh_pair_audit``): exact Jaccard over
    ``_base`` IS the n-gram Jaccard the MinHash signature estimates,
    in the same hash family, so estimator and truth are comparable
    pointwise (and, for the md5 family, SQL-replayable).

    Implementation notes (moved verbatim from ``minhash_band_frame``):
    JVM computes the shingle hashes; the permutation fold downstream
    runs vectorized in one Arrow batch (see *_vec docstring)."""
    # Staged projections (token hashes as a multi-referenced attribute) instead
    # of the let-binding combinator used by ``shingle_hashes``: the
    # let's `aggregate([], …)` form defeats Catalyst's Python-UDF
    # extraction (the UDF lands inside an interpreted projection and
    # fails with INTERNAL_ERROR), while an attribute-based expression
    # extracts cleanly — and CollapseProject keeps the stage split
    # because `_th` is non-cheap and referenced n+2 times.
    # Both projections are assembled as selectExpr strings (r11, guide
    # §4 driver side): the Column-builder form cost ~185 py4j
    # round-trips per plan build on the md5 path — the largest single
    # block of the dedup_minhash_lsh build's driver wall. The SQL trees
    # are the same expressions (spelling differences only).
    from esther_apache_spark_spark.functions.text import tokenize_sql

    tok_sql = tokenize_sql(f"`{text_col}`")
    if hash_family == "md5":
        # SQL-replayable base: each TOKEN md5-hashed once (the same
        # per-token cost profile as the simhash md5 family, ~+20% over
        # xxhash64), then shingles combined ARITHMETICALLY — a weighted
        # sum of the tokens' 30-bit halves with fixed odd ~2^29
        # constants. Every product is < 2^60 and the sum < 2^62, so the
        # arithmetic is exact signed-64-bit in BOTH engines (no
        # wraparound, ANSI-safe, plain BIGINT in DuckDB — no HUGEINT
        # needed) and the values are identical by construction, so even
        # a combine collision cannot diverge Spark from the oracle. The
        # earlier shingle-STRING md5 form (array_join per position) was
        # measured 25× slower than the xxhash64 base at sf1 — md5 per
        # shingle string, not per token, was the entire gap.
        if shingle_n and 2 * shingle_n > len(SHINGLE_COMBINE):
            raise ValueError(
                f"md5 family supports shingle_n <= {len(SHINGLE_COMBINE) // 2}"
            )
        if shingle_n:
            th = df.selectExpr(
                f"`{id_col}` AS _id",
                f"transform({tok_sql}, t -> {_md5_long_sql('t')}) AS _th",
            )
            combine = " + ".join(
                f"(get(_th, i + {j}) & {(1 << 30) - 1}) * {SHINGLE_COMBINE[2 * j]}"
                f" + shiftright(get(_th, i + {j}), 30) * {SHINGLE_COMBINE[2 * j + 1]}"
                for j in range(shingle_n)
            )
            base_df = th.selectExpr(
                "_id",
                "array_distinct(CASE WHEN size(_th) >= "
                f"{shingle_n} THEN transform(sequence(0, size(_th) - "
                f"{shingle_n}), i -> {combine}) "
                "ELSE cast(array() as array<bigint>) END) AS _base",
            )
        else:
            base_df = df.selectExpr(
                f"`{id_col}` AS _id",
                f"transform(array_distinct({tok_sql}), "
                f"e -> {_md5_long_sql('e')}) AS _base",
            )
    elif shingle_n:
        th = df.selectExpr(
            f"`{id_col}` AS _id",
            f"transform({tok_sql}, t -> xxhash64(t)) AS _th",
        )
        gram = "xxhash64(" + ", ".join(
            f"get(_th, i + {j})" for j in range(shingle_n)
        ) + ")"
        base_df = th.selectExpr(
            "_id",
            "array_distinct(CASE WHEN size(_th) >= "
            f"{shingle_n} THEN transform(sequence(0, size(_th) - "
            f"{shingle_n}), i -> {gram}) "
            "ELSE cast(array() as array<bigint>) END) AS _base",
        )
    else:
        base_df = df.selectExpr(
            f"`{id_col}` AS _id",
            f"transform(array_distinct({tok_sql}), e -> xxhash64(e)) AS _base",
        )

    return base_df


def minhash_band_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Cached MinHash signature frame ``(_id, _sig, _bh)`` — the
    signature array plus its ``bands`` band hashes — shared by the
    within-corpus candidate self-join (``minhash_lsh_candidates``) and
    the cross-corpus matcher (``minhash_cross_matches``). One narrow
    pass over the text; the caller joins on exploded ``_bh``."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    rows_per_band = num_perm // bands
    if rows_per_band * bands != num_perm:
        raise ValueError("num_perm must be divisible by bands")
    df = _non_null_text(df, text_col)

    base_df = shingle_base_frame(
        df, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, hash_family=hash_family,
    )

    # Cache the signatures (and their band hashes — computed once here,
    # consumed by the hot-bucket stats pass, the banded explode AND the
    # pair filter), not the banded exploded form: the cache is also a
    # plan barrier that keeps the Arrow-batched UDF out of the posexplode
    # generator (Python UDFs cannot run inside Generate), and it is the
    # relation both sides of the join reuse (reference C1).
    def band_hash_sql(sig: str, b: int) -> str:
        joined = "concat_ws(',', " + ", ".join(
            f"cast(element_at({sig}, {b * rows_per_band + r + 1}) as string)"
            for r in range(rows_per_band)
        ) + ")"
        if hash_family == "md5":
            return _md5_long_sql(joined)
        return f"xxhash64({joined})"

    bh_arr = "array(" + ", ".join(
        band_hash_sql("_sig", b) for b in range(bands)
    ) + ")"
    return _cache(base_df.select(
        "_id",
        minhash_signature_vec(
            F.col("_base"),
            num_perm,
            mask_bits=63 if hash_family == "md5" else None,
        ).alias("_sig"),
    ).select("_id", "_sig", F.expr(bh_arr).alias("_bh")))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    Returns (id_a, id_b, sig_agreement) with id_a < id_b, where
    sig_agreement is the fraction of matching signature positions — an
    unbiased Jaccard estimate. Pipeline: signature (narrow) → explode
    into ``bands`` band-hashes → self-join on (band, band_hash) →
    distinct pairs. The join is the only shuffle.

    ``max_bucket`` bounds the self-join fan-out on hot buckets (see
    module docstring): buckets above the cap are sharded, so a 100 TB
    boilerplate cluster costs O(shards·max_bucket²) pairs instead of
    O(cluster²).

    ``collapse_exact="auto"`` (default, VERDICT r7 #1): a one-aggregate
    dup-mass probe turns the exact-clone collapse front end on when ≥
    ``AUTO_COLLAPSE_DUP_MASS`` of rows are byte-identical texts — the
    adversarial regime where every shingle's df multiplies by the clone
    depth. Pass True/False to skip the probe and force a path (the
    collapsed pair set is exact for clone groups ≤ max_bucket, chunked
    cliques above it — same bound the direct shards deliver).

    ``hash_family="md5"`` swaps every hash site (shingle base hash,
    permutation fold, band hash, shard salt) to the md5-hex→BIGINT
    scheme so the WHOLE pipeline — signature → bands → pairs →
    sig_agreement — replays bit-for-bit in DuckDB SQL (see
    ``plans/extensions.py`` ``dedup_minhash_lsh``'s oracle). The
    xxhash64 default stays the cheaper non-replayable fast path."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    rows_per_band = num_perm // bands
    if rows_per_band * bands != num_perm:
        raise ValueError("num_perm must be divisible by bands")
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )
    if collapse_exact:
        groups, members = _collapse_identical_text(df, id_col, text_col)
        rep_pairs = minhash_lsh_candidates(
            groups,
            id_col=id_col,
            text_col=text_col,
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            max_bucket=max_bucket,
            collapse_exact=False,
            hash_family=hash_family,
        )
        # identical texts: every signature position matches
        return _expand_collapsed_pairs(
            rep_pairs,
            groups,
            members,
            id_col,
            {"sig_agreement": F.lit(1.0)},
            cap=max_bucket,
        )

    shard_hash = _mh_shard_hash_fn(hash_family)
    sig = minhash_band_frame(
        df,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
    )
    if max_bucket is not None:
        narrow = sig.select("_id", F.posexplode("_bh").alias("_band", "_bucket"))
        nsh = _hot_nsh_arr(narrow, "_id", "_band", "_bucket", bands, max_bucket)
    else:
        nsh = None
    banded = (
        _shard_arr(_with_shards(sig, nsh, bands), shard_hash, bands)
        .selectExpr(
            "_id", "_sig", "_bh", "_sh_arr",
            "posexplode(_bh) AS (_band, _bucket)",
        )
        .withColumn("_shard", F.expr("element_at(_sh_arr, _band + 1)"))
    )
    keys = ["_band", "_bucket", "_shard"]
    left = banded.selectExpr(
        "_id AS id_a", "_sig AS sig_a", "_bh AS bh_a", "_sh_arr AS sh_a",
        *keys,
    )
    right = banded.selectExpr(
        "_id AS id_b", "_sig AS sig_b", "_bh AS bh_b", "_sh_arr AS sh_b",
        *keys,
    )
    # First-MEET-band filter in place of dropDuplicates: a pair sharing k
    # bands would surface k times from the self-join; instead of a
    # dropDuplicates shuffle over the duplicated pairs (quadratic in
    # dup-cluster size — the dominant cost when boilerplate clusters are
    # large), emit the pair only from the FIRST band where the two rows
    # actually meet in the join. "Meet at band b" = band hashes agree
    # (read from the cached band-hash arrays carried on both sides — the
    # very values the join key was built from) AND both ids land in the
    # same shard of that bucket. Shard-awareness matters: identical docs
    # agree at EVERY band, so a sharded band 0 would otherwise suppress
    # the cross-shard pairs that bands 1..n re-emit — the very mechanism
    # that keeps mega-clusters connected. The emitted pair set is
    # byte-identical to the dropDuplicates form; only the duplication
    # (and its shuffle) is gone.
    # Each side's per-band shard values are precomputed ONCE PER ROW
    # before the explode (`_shard_arr` — 0 on the all-ones modulus, the
    # exact join-key formula on hot buckets), so the per-pair meet check
    # is pure array-element comparison: no hash evaluation, no modular
    # arithmetic, and a far smaller codegen footprint than inlining the
    # shard formula 2×bands times into the filter (which pushed the
    # whole-stage method over the JIT-friendly size and cost ~9× on the
    # sf1 candidate filter). When band hashes agree the two rows share a
    # bucket and therefore a modulus, so element equality is exactly the
    # old pmod-equality semantics.
    meets = "array(" + ", ".join(
        f"(element_at(bh_a, {b + 1}) = element_at(bh_b, {b + 1}))"
        f" AND (element_at(sh_a, {b + 1}) = element_at(sh_b, {b + 1}))"
        for b in range(bands)
    ) + ")"
    return (
        left.join(right, keys)
        .filter("id_a < id_b")
        .filter(f"array_position({meets}, true) = _band + 1")
        .selectExpr(
            "id_a", "id_b",
            "round(size(filter(zip_with(sig_a, sig_b, (a, b) -> a = b),"
            f" x -> x)) / {float(num_perm)!r}D, 4) AS sig_agreement",
        )
    )


def minhash_cross_matches(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    min_agree: int = 16,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Cross-corpus MinHash matches: ``(id_a, id_b, n_agree,
    sig_agreement)`` where ``id_a`` is a corpus doc, ``id_b`` a probe
    doc, the two meet in at least one LSH band, and at least
    ``min_agree`` of ``num_perm`` signature positions agree (an integer
    threshold — exact in both engines, no float compare). The
    decontamination shape: probes = the eval set, corpus = training
    docs; any returned ``id_a`` is near-dup-contaminated.

    Scale: two narrow signature passes (``minhash_band_frame``), one
    equi-join on (band, bucket) — never corpus×probes. The probe side
    is a held-out fraction, so AQE broadcasts it while it fits and
    falls back to a shuffled join beyond (no forced hint — probes grow
    with sf). Candidate fan-out is |corpus bucket|·|probe bucket| per
    (band, bucket); hot buckets are spread by AQE skew-join rather
    than the self-join path's sharding (sharding cannot shrink a cross
    product, only spread it — and here one side is usually tiny).
    Multi-band meets emit once via the same first-meet-band filter as
    ``minhash_lsh_candidates`` (no dropDuplicates shuffle)."""
    if not 0 <= min_agree <= num_perm:
        raise ValueError("min_agree must be in [0, num_perm]")
    ca = minhash_band_frame(
        corpus, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, shingle_n=shingle_n, hash_family=hash_family,
    )
    pb = minhash_band_frame(
        probes, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, shingle_n=shingle_n, hash_family=hash_family,
    )
    left = ca.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"),
        F.col("_bh").alias("bh_a"), F.posexplode("_bh").alias("_band", "_bucket"),
    )
    right = pb.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"),
        F.col("_bh").alias("bh_b"), F.posexplode("_bh").alias("_band", "_bucket"),
    )
    meets = F.array(
        *[
            F.element_at("bh_a", b + 1) == F.element_at("bh_b", b + 1)
            for b in range(bands)
        ]
    )
    n_agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
    )
    return (
        left.join(right, ["_band", "_bucket"])
        .filter(F.array_position(meets, F.lit(True)) == F.col("_band") + 1)
        .select("id_a", "id_b", n_agree.alias("n_agree"))
        .filter(F.col("n_agree") >= min_agree)
        .withColumn(
            "sig_agreement", F.round(F.col("n_agree") / F.lit(float(num_perm)), 4)
        )
    )


def _ngram_collapsed_parts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    threshold: float,
    max_df: int | None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Collapsed n-gram-Jaccard candidate machinery shared by the pair
    and component-label entry points: ``(rep_pairs, groups, members,
    intra_members)``. Representative pairs run the direct inverted-index
    join over DISTINCT texts with member-count-weighted df pruning (so
    pruning decisions equal the direct path's — ADVICE r7);
    ``intra_members`` narrows to groups with ≥ 1 shingle, matching the
    direct path's inability to pair empty-shingle texts."""
    groups, members = _collapse_identical_text(df, id_col, text_col)
    gw = members.groupBy("_tkey").agg(F.count(F.lit(1)).alias("_dfw"))
    rep_pairs = ngram_jaccard_pairs(
        groups.join(gw, "_tkey"),
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        threshold=threshold,
        max_df=max_df,
        collapse_exact=False,
        _df_weight_col="_dfw",
    )
    nonempty = groups.filter(
        F.size(
            F.array_distinct(shingle_hashes(tokenize(F.col(text_col)), shingle_n))
        )
        > 0
    ).select("_tkey")
    return rep_pairs, groups, members, members.join(nonempty, "_tkey", "semi")


def ngram_jaccard_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100_000,
    collapse_exact: bool | str = "auto",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup cluster labels ``(node, comp)`` for exact n-gram Jaccard
    ≥ ``threshold`` — what the survivor/leakage-split consumers feed
    connected components. Identical output to ``connected_components``
    over ``ngram_jaccard_pairs(...)`` edges (any ``expand_cap``), but
    under collapse the iterative stage runs on the QUOTIENT graph (one
    node per distinct text) via ``_quotient_labels`` — no clique
    expansion is ever materialized, so a d-deep verbatim clone cluster
    costs the component stage O(1) nodes instead of O(d) nodes and
    O(d·cap) edges. The r8 sf10 checkpoint fed 18.16M expanded edges
    through CC in every survivor-family query; the quotient graph at
    the same corpus has ~5k nodes."""
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )
    if not collapse_exact:
        from esther_apache_spark_spark.operators.components import (
            connected_components,
        )

        pairs = ngram_jaccard_pairs(
            df,
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            threshold=threshold,
            max_df=max_df,
            collapse_exact=False,
        )
        return connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
        )
    rep_pairs, groups, members, im = _ngram_collapsed_parts(
        df, id_col, text_col, shingle_n, threshold, max_df
    )
    return _quotient_labels(
        rep_pairs,
        groups,
        members,
        id_col,
        "_tkey",
        intra_members=im,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100_000,
    collapse_exact: bool | str = "auto",
    expand_cap: int | None = None,
    _df_weight_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs via an
    inverted-index join (explode shingles → join on shingle → exact
    recount of the intersection on the full shingle sets).

    ``max_df`` prunes the inverted index: shingles appearing in more
    than ``max_df`` documents (stop-shingles — boilerplate, license
    headers) are dropped BEFORE the self-join, so a shingle with df = d
    contributes O(d²) candidate pairs only while d ≤ max_df. Without it
    a shingle in 1% of a 100 TB corpus alone yields ~(0.01·N)² pairs.
    Pruning affects candidate RECALL only, never values: the reported
    jaccard is recomputed exactly on the full (unpruned) shingle sets,
    so any emitted pair carries its true Jaccard including hot shingles.
    A pair is missed only if ALL its shared shingles are hot — the
    default cap (100k docs) makes that astronomically unlikely for real
    near-dups. ``max_df=None`` disables pruning (fully exact).

    ``collapse_exact`` is the clone-heavy-corpus knob (same machinery
    as the minhash/simhash/embedding paths): byte-identical texts
    collapse to one representative before the inverted index, so a
    d-deep verbatim clone cluster no longer multiplies every shingle's
    document frequency by d — the r7 sf10 checkpoint measured the
    DIRECT path OOMing a 48 GB heap on 100-deep planted clones, where
    the collapsed path runs at the distinct-text corpus's cost. The
    ``"auto"`` default (VERDICT r7 #1) probes the corpus's dup mass
    with one narrow aggregate and flips the collapse on at ≥
    ``AUTO_COLLAPSE_DUP_MASS``; pass True/False to force a path. Exact:
    cross-group pairs recompute Jaccard on the representative shingle
    sets (identical texts ⇒ identical sets) and intra-group pairs are
    Jaccard 1.0 by definition (empty-shingle texts excluded — the
    direct path never pairs them). ``expand_cap`` bounds the intra
    expansion via the cap/chunk contract of ``_expand_collapsed_pairs``
    — set it when the consumer is connected components (cluster
    structure preserved, pair COUNT linear); leave ``None`` for the
    complete exact pair set.

    Pruning basis under collapse (ADVICE r7): each representative's
    shingles count toward document frequency with the group's MEMBER
    COUNT as weight, so df here is exactly the direct path's df (a
    shingle in a d-deep clone cluster contributes d, not 1) and the
    byte-identical-to-direct claim holds all the way to the ``max_df``
    boundary — any df-mirroring oracle sees the same pruning decisions
    either way."""
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )
    if collapse_exact:
        rep_pairs, groups, members, im = _ngram_collapsed_parts(
            df, id_col, text_col, shingle_n, threshold, max_df
        )
        return _expand_collapsed_pairs(
            rep_pairs,
            groups,
            members,
            id_col,
            {"jaccard": F.lit(1.0)},
            cap=expand_cap,
            intra_members=im,
        )
    # Shingles travel as 64-bit hashes, not strings: same distinct-set
    # cardinality w.h.p. (64-bit collisions negligible), far cheaper to
    # build, and the inverted-index join shuffles longs instead of text.
    sel = [
        F.col(id_col).alias("_id"),
        F.array_distinct(
            shingle_hashes(tokenize(F.col(text_col)), shingle_n)
        ).alias("_sh"),
    ]
    if _df_weight_col is not None:
        sel.append(F.col(_df_weight_col).cast("long").alias("_dfw"))
    # (A narrow-scan spread before this cache fill was A/B'd in r11 and
    # LOST at warm medians — the repartition + wide cache reads cost more
    # than the fill parallelism buys; the spread stays only in
    # substring_dup_spans, where it measured 1.5x.)
    shingled = _cache(df.select(*sel))
    # feeds the index join and the exact-recount joins
    inv = shingled.select("_id", F.explode("_sh").alias("_g"))
    hot = None
    inv_kept = inv
    if max_df is not None:
        # document frequency per shingle is a map-side-combinable count
        # (weighted by member count under collapse — see docstring);
        # the hot-shingle list is tiny (≤ distinct_shingles/max_df) → broadcast anti-join
        if _df_weight_col is not None:
            dfagg = shingled.select(
                "_dfw", F.explode("_sh").alias("_g")
            ).groupBy("_g").agg(F.sum("_dfw").alias("_df"))
        else:
            dfagg = inv.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        hot = dfagg.filter(F.col("_df") > max_df).select("_g")
        inv_kept = inv.join(F.broadcast(hot), "_g", "left_anti")
    # Intersection by COUNTING the inverted-index join (r10): the arrays
    # are distinct per document, so the self-join emits exactly one row
    # per (pair, shared kept shingle) and a partial-aggregable count IS
    # |A∩B| over kept shingles — the guide-§8 move (shuffle keys, not
    # payloads). The former shape re-joined the full shingle ARRAYS onto
    # every candidate pair (two exchanges carrying the heaviest column)
    # and ran array_intersect per pair — 120 CPU-seconds at sf0.1 vs a
    # counting shuffle of (id, id) rows.
    common = (
        inv_kept.alias("a")
        .join(inv_kept.alias("b"), "_g")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    if hot is not None:
        # Exact correction for shingles ABOVE max_df: the counting join
        # sees only kept shingles, but the emitted jaccard is defined on
        # the FULL sets. Each doc's hot subset is a tiny array (≤ |hot|),
        # distributed via the inverted index — no driver collect.
        hsub = (
            inv.join(F.broadcast(hot), "_g", "semi")
            .groupBy("_id")
            .agg(F.collect_set("_g").alias("_hsh"))
        )
        common = (
            common.join(
                hsub.select(F.col("_id").alias("id_a"), F.col("_hsh").alias("_hsha")),
                "id_a",
                "left",
            )
            .join(
                hsub.select(F.col("_id").alias("id_b"), F.col("_hsh").alias("_hshb")),
                "id_b",
                "left",
            )
            .select(
                "id_a",
                "id_b",
                (
                    F.col("_common")
                    + F.when(
                        F.col("_hsha").isNotNull() & F.col("_hshb").isNotNull(),
                        F.size(F.array_intersect("_hsha", "_hshb")),
                    ).otherwise(F.lit(0))
                ).alias("_common"),
            )
        )
    sizes = shingled.select("_id", F.size("_sh").alias("_sz"))
    # jaccard = |A∩B| / |A∪B| as a raw double ratio — int/int division is
    # bit-identical across engines (no decimal re-rounding to drift)
    jac = (
        common.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_sza") + F.col("_szb") - F.col("_common")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash(tokens: Column, bits: int = 64) -> Column:
    """array<string> -> bigint SimHash (Charikar 2002): per-token 64-bit
    hash; each bit position accumulates +1/-1; sign of the sum gives the
    fingerprint bit. Pure expressions via transform/aggregate over bit
    positions — no UDF."""
    if bits != 64:
        raise ValueError("only 64-bit simhash supported")
    # ONE pass over the tokens: hash each token once, then fold its ±1
    # bit votes into a 64-wide counter array (aggregate + zip_with).
    # The naive form (64 separate filter() passes over the token-hash
    # array) re-evaluates the tokenization per bit — interpreted HOFs
    # make that ~60× slower.
    h = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        h,
        F.array_repeat(F.lit(0), bits),
        lambda acc, x: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                # call_function: the SQL shiftright accepts a column
                # shift amount; the Python wrapper insists on an int
                lambda i: F.when(
                    F.call_function("shiftright", x, i).bitwiseAND(
                        F.lit(1).cast("long")
                    )
                    != 0,
                    1,
                ).otherwise(-1),
            ),
            lambda a, b: a + b,
        ),
    )
    # votes[i] >= 0  <=>  ones*2 >= n  =>  set bit i. Bit 63 wraps like
    # Java (1L << 63 == Long.MIN_VALUE), which is exactly the mask.
    masks = F.transform(
        votes,
        lambda v, i: F.when(
            v >= 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        masks, F.lit(0).cast("long"), lambda acc, m: acc.bitwiseOR(m)
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates by SimHash banding: split the ``bits``-wide
    fingerprint into bits/band_bits bands; docs sharing any band are
    candidates (Hamming-distance blocking). Returns (id_a, id_b,
    hamming) pairs. ``max_bucket`` shards hot buckets to bound the
    self-join fan-out (see module docstring); ``collapse_exact``
    additionally collapses byte-identical texts to one representative
    first (identical fingerprints — pair set preserved exactly, clone
    clusters stop inflating buckets; see _collapse_identical_text).
    The ``"auto"`` default (VERDICT r7 #1 — the sf10 checkpoint read
    122 s direct on a 100-deep-clone corpus) probes dup mass with one
    narrow aggregate and collapses at ≥ ``AUTO_COLLAPSE_DUP_MASS``;
    pass True/False to force a path.

    ``hash_family="md5"`` (pair with ``bits=60``, ``band_bits=15``)
    hashes tokens with the md5-hex→BIGINT scheme: 60 informative bits,
    non-negative fingerprint (no Java sign wrap), so fingerprints,
    bands, pairs AND hamming distances replay exactly in DuckDB SQL —
    see ``plans/extensions.py`` ``dedup_simhash``'s oracle."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    if hash_family == "xxhash64" and bits != 64:
        raise ValueError("xxhash64 family supports bits=64 only")
    if bits % band_bits:
        raise ValueError("bits must be divisible by band_bits")
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )
    if collapse_exact:
        groups, members = _collapse_identical_text(df, id_col, text_col)
        rep_pairs = simhash_candidates(
            groups,
            id_col=id_col,
            text_col=text_col,
            band_bits=band_bits,
            max_bucket=max_bucket,
            collapse_exact=False,
            bits=bits,
            hash_family=hash_family,
        )
        # identical texts: identical fingerprints, Hamming distance 0
        return _expand_collapsed_pairs(
            rep_pairs,
            groups,
            members,
            id_col,
            {"hamming": F.bit_count(F.lit(0))},
            cap=max_bucket,
        )
    nbands = bits // band_bits
    if hash_family == "md5":
        token_hashes = F.transform(
            tokenize(F.col(text_col)), lambda t: md5_long(t)
        )
    else:
        token_hashes = F.transform(
            tokenize(F.col(text_col)), lambda t: F.xxhash64(t)
        )

    shard_hash = _mh_shard_hash_fn(hash_family)

    # cache = reuse across both join sides AND a plan barrier keeping the
    # Arrow UDF out of the posexplode generator (see minhash note)
    fp = _cache(df.select(  # df already NULL-text-filtered at entry
        F.col(id_col).alias("_id"),
        simhash_vec(token_hashes, bits=bits).alias("_fp"),
    ))
    mask = (1 << band_bits) - 1

    def band_val_sql(col: str, b: int) -> str:
        return f"(shiftright({col}, {b * band_bits}) & cast({mask} as bigint))"

    band_arr_sql = "array(" + ", ".join(
        band_val_sql("_fp", b) for b in range(nbands)
    ) + ")"
    if max_bucket is not None:
        narrow = fp.selectExpr(
            "_id", f"posexplode({band_arr_sql}) AS (_band, _bucket)"
        )
        nsh = _hot_nsh_arr(narrow, "_id", "_band", "_bucket", nbands, max_bucket)
    else:
        nsh = None
    banded = (
        _shard_arr(_with_shards(fp, nsh, nbands), shard_hash, nbands)
        .selectExpr(
            "_id", "_fp", "_sh_arr",
            f"posexplode({band_arr_sql}) AS (_band, _bucket)",
        )
        .withColumn("_shard", F.expr("element_at(_sh_arr, _band + 1)"))
    )
    keys = ["_band", "_bucket", "_shard"]
    l, r = banded.alias("a"), banded.alias("b")

    # First-MEET-band filter in place of dropDuplicates — emit each pair
    # only from the first band where the fingerprints agree AND the two
    # ids share that bucket's shard. Per-band shard values are
    # precomputed once per ROW (`_shard_arr`, the exact join-key
    # formula), so the per-pair check is pure element comparison — see
    # the minhash variant for the full rationale (shard-awareness keeps
    # mega-clusters connected; pair set byte-identical to the
    # dropDuplicates form; inlining the shard formula per pair blew the
    # codegen size and cost ~9× on the sf1 filter).
    meets = "array(" + ", ".join(
        f"({band_val_sql('a._fp', b)} = {band_val_sql('b._fp', b)})"
        f" AND (element_at(a._sh_arr, {b + 1}) = element_at(b._sh_arr, {b + 1}))"
        for b in range(nbands)
    ) + ")"
    return (
        l.join(r, keys)
        .filter("a._id < b._id")
        .filter(f"array_position({meets}, true) = _band + 1")
        .selectExpr(
            "a._id AS id_a", "b._id AS id_b",
            "bit_count(a._fp ^ b._fp) AS hamming",
        )
    )


def simhash_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
    bits: int = 64,
    hash_family: str = "xxhash64",
    max_hamming: int | None = None,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup cluster labels ``(node, comp)`` from SimHash banding —
    the fingerprint-modality sibling of ``ngram_jaccard_components`` /
    ``embedding_cosine_components``. Identical output to
    ``connected_components`` over ``simhash_candidates(...)`` edges
    (optionally gated at ``hamming <= max_hamming``; ``None`` keeps all
    banded candidates), but under collapse the iterative stage runs on
    the QUOTIENT graph via ``_quotient_labels`` — one node per DISTINCT
    text, no clique expansion.

    Unlike the ngram/vector twins there is NO intra-membership
    narrowing: EVERY text has a fingerprint (zero tokens included —
    ``simhash_vec`` ties all bit votes at 0 and emits the all-ones tie
    pattern), identical texts are always Hamming 0, and 0 passes any
    sensible ``max_hamming`` — so every clone group with >= 2 members
    intra-clusters, and ``intra_members`` stays the full member map."""
    if max_hamming is not None and max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )

    def _gate(pairs: DataFrame) -> DataFrame:
        if max_hamming is None:
            return pairs
        return pairs.filter(F.col("hamming") <= max_hamming)

    if not collapse_exact:
        from esther_apache_spark_spark.operators.components import (
            connected_components,
        )

        pairs = _gate(
            simhash_candidates(
                df,
                id_col=id_col,
                text_col=text_col,
                band_bits=band_bits,
                max_bucket=max_bucket,
                collapse_exact=False,
                bits=bits,
                hash_family=hash_family,
            )
        )
        return connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
        )
    groups, members = _collapse_identical_text(df, id_col, text_col)
    rep_pairs = _gate(
        simhash_candidates(
            groups,
            id_col=id_col,
            text_col=text_col,
            band_bits=band_bits,
            max_bucket=max_bucket,
            collapse_exact=False,
            bits=bits,
            hash_family=hash_family,
        )
    )
    return _quotient_labels(
        rep_pairs,
        groups,
        members,
        id_col,
        "_tkey",
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    )


def embedding_cosine_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """Embedding near-dup pairs: multi-table random-hyperplane LSH
    candidate generation, then exact cosine ≥ threshold within buckets.
    Returns (id_a, id_b, cosine).

    Candidates come from an equi-join on (table, bucket) — never
    all-pairs. Recall is tuned by (n_planes, n_tables); the defaults give
    ~87% recall at cosine 0.4 (see ``srp_table_buckets``). At larger
    corpora raise n_planes (smaller buckets) and n_tables together.

    ``collapse_exact`` (default ``"auto"`` since r8 — a one-aggregate
    dup-mass probe picks the path: collapse costs ~1.6× on clone-free
    corpora and won 73× at the r7 sf10 checkpoint's 100-deep clones,
    see BASELINE.md; the regimes sit decades apart so the probe
    threshold ``AUTO_COLLAPSE_DUP_MASS`` separates them cleanly; pass
    True/False to force a path) collapses
    byte-identical vectors to one representative BEFORE the LSH pipeline
    and expands pairs back afterwards. Identical vectors land in identical buckets in every
    table, so a clone cluster of size k inflates every one of its
    buckets k× and the quadratic GEMM/meet work k²× — the dominant cost
    on boilerplate-heavy corpora (warm median 4.3 s vs 11.0 s direct on
    the sf1 scale set, whose planted clusters are 10 clones deep; the
    gap widens quadratically with clone depth). The pair SET
    is preserved exactly: cross-group pairs expand from representative
    pairs (members share their representative's buckets, and cosine is
    computed on the same vectors), intra-group pairs are emitted
    directly with cosine 1.0 (what the GEMM yields for identical
    nonzero vectors after the 4-decimal round; zero-norm groups are
    skipped, matching the kernel's zero-norm exclusion).

    Pass ``dim`` when known (it is schema metadata, e.g. a fixed
    embedding width) — deriving it costs one extra driver job scanning a
    row. ``max_bucket`` shards hot buckets so the per-bucket GEMM rerank
    is bounded at O(max_bucket²) memory/compute no matter how large a
    boilerplate cluster gets (see module docstring)."""
    df = _non_null_vec(df, vec_col)
    # same content key the collapse branch uses (md5 over to_json — see
    # the null-element note below), so the probe measures exactly the
    # mass the collapse would remove
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.to_json(F.col(vec_col))), collapse_exact, "vec"
    )
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty dataframe; pass dim explicitly")
        dim = first["d"]

    # NO cast to array<double> here: the source column is float32 and
    # every consumer of _v is a numpy kernel that widens to float64 on
    # entry (exact for every float32 value) — casting before the
    # 12-table explode would double the shuffle payload for zero
    # information. Expression-level consumers below cast locally.
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if collapse_exact:
        groups, members = _collapse_identical_vec(base)
        src = groups.select("_id", "_v")
    else:
        src = base

    rep_pairs = _srp_rep_pairs(
        src, threshold, n_planes, n_tables, seed, dim, max_bucket
    )
    if not collapse_exact:
        return rep_pairs

    # Expand representative pairs back to member pairs (see
    # _expand_collapsed_pairs for the cap/chunk contract). Intra pairs
    # exist only among nonzero-norm members — zero-norm vectors have
    # undefined cosine and the kernel drops them, so the expansion must
    # too. If the threshold exceeds 1.0, intra pairs (cosine exactly
    # 1.0) cannot qualify — expand cross pairs only.
    nz_keys = _nonzero_vec_keys(groups)
    mm = members.join(nz_keys, "_vkey") if threshold <= 1.0 else members.limit(0)
    return _expand_collapsed_pairs(
        rep_pairs,
        groups,
        members,
        "_id",
        {"cosine": F.lit(1.0)},
        key_col="_vkey",
        cap=max_bucket,
        intra_members=mm,
    )


def _collapse_identical_vec(base: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(groups, members) for exact-vector collapse over a ``(_id, _v)``
    frame. Content key: md5 over the JSON rendering — identical values
    only (an ulp of difference keeps rows apart, which is safe: they
    just don't collapse). JSON, not concat_ws: concat_ws silently DROPS
    null elements, so [1.0, null, 2.0] and [1.0, 2.0] would collide;
    to_json encodes nulls explicitly. 128-bit key → collision-free in
    practice at any corpus size. Both frames cached per the module
    cache doctrine (members is the narrow no-vector map reused by the
    expansion joins; groups holds one vector per DISTINCT content and
    spills to disk at corpus scale)."""
    keyed = base.withColumn("_vkey", F.md5(F.to_json(F.col("_v"))))
    members = _cache(keyed.select("_vkey", F.col("_id").alias("_mid")))
    groups = _cache(
        keyed.groupBy("_vkey")
        .agg(F.min("_id").alias("_id"), F.first("_v").alias("_v"))
    )
    return groups, members


def _nonzero_vec_keys(groups: DataFrame) -> DataFrame:
    """Group keys whose vector has nonzero norm — the only groups whose
    identical members can form intra pairs (cosine of identical
    NONZERO vectors is 1.0; zero-norm cosine is undefined and the GEMM
    kernel drops those rows). Cast locally: x*x in float32 can
    underflow to 0 for subnormal-ish inputs where the kernel's float64
    square stays positive."""
    return groups.filter(
        F.aggregate(
            F.col("_v").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
        > 0
    ).select("_vkey")


def _srp_rep_pairs(
    src: DataFrame,
    threshold: float,
    n_planes: int,
    n_tables: int,
    seed: int,
    dim: int,
    max_bucket: int | None,
) -> DataFrame:
    """SRP-LSH candidate generation + exact in-bucket cosine rerank over
    a ``(_id, _v)`` frame → ``(id_a, id_b, cosine)``. The shared core of
    ``embedding_cosine_dups`` (direct path, and collapsed path over
    distinct vectors) and ``embedding_cosine_components``."""
    import numpy as np
    import pandas as pd

    from esther_apache_spark_spark.operators.similarity import srp_table_buckets_vec

    # Cache the bucketed projection (r11, VERDICT r10 #1): the hot-stats
    # pass and the banded explode are two consumers of the SRP bucket
    # UDF — uncached, each re-ran the Arrow GEMM pass over the input
    # scan (joining the buckets back by id was A/B'd in r10 and lost:
    # it shuffles the VECTORS). The cache evaluates the UDF once, is
    # enrolled in the ambient cache_scope (bench/pipeline callers free
    # it), and spills MEMORY_AND_DISK at corpus scale. Measured at
    # sf0.1: dedup_embedding_cosine 1.68 -> 1.34 s warm, identical
    # pairs.
    proj = _cache(src.select(
        "_id",
        "_v",
        srp_table_buckets_vec(F.col("_v"), dim, n_planes, n_tables, seed).alias(
            "_all"
        ),
    ))
    if max_bucket is not None:
        narrow = proj.selectExpr(
            "_id", "posexplode(_all) AS (_table, _bucket)"
        )
        nsh = _hot_nsh_arr(narrow, "_id", "_table", "_bucket", n_tables, max_bucket)
    else:
        nsh = None
    b = (
        _with_shards(proj, nsh, n_tables)
        .withColumn(
            "_shard_arr",
            F.expr(
                f"transform(sequence(0, {n_tables - 1}), "
                "t -> pmod(xxhash64(_id, t), element_at(_nsh_arr, t + 1)))"
            ),
        )
        .selectExpr(
            "_id", "_v", "_all", "_shard_arr",
            "posexplode(_all) AS (_table, _bucket)",
        )
        .withColumn("_shard", F.expr("element_at(_shard_arr, _table + 1)"))
    )
    group_keys = ["_table", "_bucket", "_shard"]

    # Exact rerank per bucket as ONE numpy GEMM over the bucket's vectors
    # (Arrow-batched applyInPandas) — the candidate count is quadratic in
    # bucket size, so interpreted per-pair dot expressions dominate the
    # whole operator; a dense S = N·Nᵀ on ≤ a few thousand rows is
    # near-free. Zero-norm vectors are excluded (cosine undefined —
    # matches the expression form, where a NULL cosine fails the
    # threshold filter).
    # Each row carries its full per-table bucket array (_all) AND its
    # per-table shard array (_shard_arr), so the rerank can apply the
    # first-MEET-table rule: a pair co-grouped in k of the n_tables
    # (table, bucket, shard) groups is emitted only from the FIRST table
    # where buckets AND shards both agree, replacing the final
    # dropDuplicates shuffle (quadratic in dup-cluster size) with a
    # per-pair argmax inside the GEMM kernel. Shard agreement must be
    # part of the meet test (not bucket agreement alone): identical
    # vectors agree at every table, so a sharded table 0 would otherwise
    # suppress the cross-shard pairs that tables 1..n re-emit — the
    # mechanism that keeps mega-clusters connected. Pair set is
    # byte-identical to the dropDuplicates form.
    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        m = np.array(pdf["_v"].tolist(), dtype="float64")
        tables = np.array(pdf["_all"].tolist(), dtype="int64")  # (n, n_tables)
        shards = np.array(pdf["_shard_arr"].tolist(), dtype="int64")
        cur_table = int(pdf["_table"].iloc[0])
        norms = np.linalg.norm(m, axis=1)
        keep = norms > 0
        ids, m, tables, shards = ids[keep], m[keep], tables[keep], shards[keep]
        if len(ids) < 2:
            return empty
        norms = norms[keep]
        m = m / norms[:, None]
        s = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        cos = np.round(s[iu, ju], 4)
        # first table where the pair meets (bucket AND shard agree)
        # == this group's table; every pair here meets at cur_table
        meet = (tables[iu] == tables[ju]) & (shards[iu] == shards[ju])
        first_hit = meet.argmax(axis=1)
        ok = (cos >= threshold) & (first_hit == cur_table)
        a, bb = ids[iu[ok]], ids[ju[ok]]
        lo, hi = np.minimum(a, bb), np.maximum(a, bb)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[ok]})

    return b.groupBy(*group_keys).applyInPandas(
        bucket_pairs, "id_a long, id_b long, cosine double"
    )


def embedding_cosine_components(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Semantic near-dup cluster labels ``(node, comp)`` for cosine ≥
    ``threshold`` — the embedding twin of ``ngram_jaccard_components``.
    Identical output to ``connected_components`` over
    ``embedding_cosine_dups(...)`` edges (any ``max_bucket``), but
    under collapse the iterative stage runs on the QUOTIENT graph (one
    node per distinct vector) via ``_quotient_labels`` — clique
    expansion never materializes, so clone-heavy corpora (the r7/r8
    sf10 checkpoints' 100-deep planted clusters → 18.16M expanded
    edges) feed connected components a graph the size of the DISTINCT
    corpus instead."""
    df = _non_null_vec(df, vec_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.to_json(F.col(vec_col))), collapse_exact, "vec"
    )
    if not collapse_exact:
        from esther_apache_spark_spark.operators.components import (
            connected_components,
        )

        pairs = embedding_cosine_dups(
            df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            n_planes=n_planes,
            n_tables=n_tables,
            seed=seed,
            dim=dim,
            max_bucket=max_bucket,
            collapse_exact=False,
        )
        return connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
        )
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty dataframe; pass dim explicitly")
        dim = first["d"]
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    groups, members = _collapse_identical_vec(base)
    rep_pairs = _srp_rep_pairs(
        groups.select("_id", "_v"), threshold, n_planes, n_tables, seed, dim,
        max_bucket,
    )
    nz_keys = _nonzero_vec_keys(groups)
    mm = members.join(nz_keys, "_vkey") if threshold <= 1.0 else members.limit(0)
    return _quotient_labels(
        rep_pairs,
        groups,
        members,
        "_id",
        "_vkey",
        intra_members=mm,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    )


def corpus_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 12,
    max_df: int = 2,
) -> DataFrame:
    """C4-style corpus-level line deduplication (Raffel et al. 2020,
    "three-sentence span" dedup family): segment every document, drop
    repeated segments corpus-wide keeping only their FIRST occurrence
    (min (id, position)), and report the per-document survivorship.
    Segments occurring in at most ``max_df`` places are left alone —
    only boilerplate (navigation chrome, license headers) is scrubbed.

    "Lines" are fixed ``seg_tokens``-token windows rather than
    newline-delimited lines: the synthetic corpus carries no newlines,
    and the policy is delimiter-agnostic — swap the segmentation
    expression for a ``split(text, '\\n')`` explode on real corpora.

    Returns (id, n_segments, n_kept, n_dropped, text_hash) where
    text_hash is md5 of the surviving text (kept segments joined in
    order) — the downstream contract is "which docs shrank and to
    what", not a re-materialized corpus.

    Scale shape: segments shuffle ONCE as (16-byte md5, id, idx) for the
    frequency aggregate (map-side combined); the over-``max_df`` subset
    of that aggregate is tiny by construction (hot segments are rare),
    so the keep-filter join broadcasts under AQE and the segment stream
    itself is never reshuffled for it. The per-doc reassembly is the
    second and only other shuffle. No window-over-hash anywhere: a
    boilerplate segment with 100M occurrences would serialize through a
    single window partition, but only contributes one combined row per
    map task here."""
    toks = tokenize(F.col(text_col), normalize=False)
    base = df.select(
        F.col(id_col).alias("_id"),
        toks.alias("_t"),
        F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("long").alias("n_segments"),
    )
    segs = base.select(
        "_id",
        F.posexplode(
            F.when(
                F.size("_t") > 0,
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - 1, F.lit(seg_tokens)),
                    lambda s: F.array_join(F.slice("_t", s + 1, seg_tokens), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("seg_idx", "seg_text"),
    ).withColumn("_h", F.md5(F.col("seg_text").cast("binary")))
    hot = (
        segs.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col("_id"), F.col("seg_idx"))).alias("_first"),
        )
        .filter(F.col("_c") > max_df)
    )
    kept = segs.join(hot, "_h", "left").filter(
        F.col("_c").isNull()
        | (
            (F.col("_id") == F.col("_first._id"))
            & (F.col("seg_idx") == F.col("_first.seg_idx"))
        )
    )
    agg = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg_text"))),
                    lambda x: x["seg_text"],
                ),
                " ",
            ).cast("binary")
        ).alias("text_hash"),
    )
    return (
        base.select("_id", "n_segments")
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_segments",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            (F.col("n_segments") - F.coalesce("n_kept", F.lit(0).cast("long"))).alias(
                "n_dropped"
            ),
            F.coalesce("text_hash", F.md5(F.lit("").cast("binary"))).alias("text_hash"),
        )
    )


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_doc_freq: int = 2,
    scope: str = "cross_doc",
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """Exact substring-level duplicate spans (the deduplicate-text-
    datasets operator of Lee et al. 2022, k-gram approximation): find,
    per document, the maximal token spans of length >= ``k`` whose every
    k-token window also occurs in at least ``min_doc_freq`` distinct
    documents. Returns (id, span_start, span_len) with 0-based token
    offsets and lengths in tokens.

    ``scope="any"`` counts total OCCURRENCES instead of distinct
    documents, so a window repeated ``min_doc_freq`` times inside ONE
    document also qualifies — the within-doc repetition-trimming
    variant (the span-level sibling of the Gopher duplicate-n-gram
    fraction in ``textstats``).

    Construction — LINEAR, no pair join anywhere:
      1. tokens md5-hashed once (``md5_long``), k-token windows combined
         arithmetically (``SPAN_COMBINE`` weighted sum of 30-bit halves
         — exact 64-bit in both engines) so the shuffle carries 8-byte
         keys, never text;
      2. the duplicated-window set = windows whose distinct-doc count
         reaches ``min_doc_freq`` (two hash aggregates, both map-side
         combinable) — a semi-join marks each position, no doc pairs
         are ever materialized, so a boilerplate passage shared by a
         MILLION docs costs O(occurrences), not O(docs²);
      3. runs of consecutive duplicated positions merge into maximal
         spans with the islands trick (pos - row_number), one window
         partitioned by doc id.

    Exactness caveat (inherent to the k-gram approximation, shared with
    the published suffix-array formulation only up to merging): a
    merged run guarantees every k-window inside it is duplicated
    somewhere, not that the whole span is contiguous in one partner
    document. For exact duplicated passages (the target workload) the
    two coincide.

    SQL-replayable end-to-end: window hashing is the md5-hex→BIGINT
    scheme and every later step is relational — see
    ``dedup_substring_spans``'s DuckDB oracle in plans/extensions.py.

    ``collapse_exact`` (True/False/"auto", same probe as the pair APIs):
    byte-identical texts have byte-identical window sets and therefore
    byte-identical spans, so under collapse the tokenize → explode →
    islands pipeline runs once per DISTINCT text, window document
    frequency is summed with each distinct text weighted by its member
    count (exactly the count the direct path computes — cross_doc
    counts distinct docs, "any" counts occurrences, and every member
    contributes identically), and the finished spans replicate to
    members in ONE final join. A d-deep verbatim clone cluster costs
    the heavy stages 1× instead of d× with identical output — the r8
    sf10 corpus (100-deep planted clones) spent 46-60 s here, the
    single remaining clone-linear pipeline stage after the quotient-CC
    change."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if 2 * k > len(SPAN_COMBINE):
        raise ValueError(f"k must be <= {len(SPAN_COMBINE) // 2}")
    if scope not in ("cross_doc", "any"):
        raise ValueError(f"unknown scope: {scope!r}")
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )

    # Tokens are md5-hashed ONCE; each k-window combines its tokens'
    # 30-bit halves with the fixed SPAN_COMBINE weights — exact 64-bit
    # integer arithmetic in both engines (the k-window-STRING md5 form
    # this replaces was measured 87 s/run at sf1; this is ~6 s).
    def _pos_windows(src: DataFrame, key_col: str) -> DataFrame:
        th = src.select(
            F.col(key_col).alias("_id"),
            F.transform(tokenize(F.col(text_col)), lambda t: md5_long(t)).alias(
                "_th"
            ),
        )
        starts = F.sequence(F.lit(0), F.size("_th") - k)

        def _wcomb(i: Column) -> Column:
            out = None
            for j in range(k):
                h = F.get("_th", i + F.lit(j))
                lo = h.bitwiseAND(F.lit((1 << 30) - 1)) * F.lit(SPAN_COMBINE[2 * j])
                hi = F.shiftright(h, 30) * F.lit(SPAN_COMBINE[2 * j + 1])
                out = lo if out is None else out + lo
                out = out + hi
            return out

        wins = F.when(F.size("_th") >= k, F.transform(starts, _wcomb)).otherwise(
            F.array().cast("array<bigint>")
        )
        return th.select("_id", F.posexplode(wins).alias("_pos", "_h"))

    members = None
    if collapse_exact:
        groups, members = _collapse_identical_text(df, id_col, text_col)
        gw = members.groupBy("_tkey").agg(F.count(F.lit(1)).alias("_w"))
        # cached: feeds both the df aggregate and the dup-position
        # semi-join — one tokenize/explode pass per distinct text total
        pos_h = _cache(_pos_windows(groups, "_tkey"))
        occurrences = pos_h.select("_h", "_id")
        if scope == "cross_doc":
            occurrences = occurrences.distinct()
        dup_h = (
            occurrences.join(gw.withColumnRenamed("_tkey", "_id"), "_id")
            .groupBy("_h")
            .agg(F.sum("_w").alias("_docs"))
            .filter(F.col("_docs") >= min_doc_freq)
            .select("_h")
        )
    else:
        # cached for the same two consumers as the collapsed branch —
        # the recompute this replaces paid tokenize+explode twice
        # (measured 2× whole-query at sf0.1). pos_h is 3 narrow columns
        # but O(corpus tokens) rows: it spills to executor disk at
        # scale, which is still far cheaper than a second full scan +
        # per-token md5 pass. The spread (r11) unsticks the tokenize+
        # md5+explode pass from a single-row-group scan — see
        # _spread_narrow_input for the scale gate.
        pos_h = _cache(_pos_windows(_spread_narrow_input(df), id_col))
        occurrences = pos_h.select("_h", "_id")
        if scope == "cross_doc":
            occurrences = occurrences.distinct()
        dup_h = (
            occurrences.groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_docs"))
            .filter(F.col("_docs") >= min_doc_freq)
            .select("_h")
        )
    dup_pos = pos_h.join(dup_h, "_h", "left_semi")
    w = Window.partitionBy("_id").orderBy("_pos")
    runs = dup_pos.withColumn("_grp", F.col("_pos") - F.row_number().over(w))
    spans = runs.groupBy("_id", "_grp").agg(
        F.min("_pos").alias("span_start"),
        (F.max("_pos") - F.min("_pos") + F.lit(k)).alias("span_len"),
    )
    if collapse_exact:
        spans = spans.join(
            members.withColumnRenamed("_tkey", "_id"), "_id"
        ).select(F.col("_mid").alias("_id"), "span_start", "span_len")
    return spans.select(
        F.col("_id").alias(id_col),
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_len").cast("int").alias("span_len"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 100_000,
    collapse_exact: bool | str = "auto",
    expand_cap: int | None = None,
    _df_weight_col: str | None = None,
) -> DataFrame:
    """Directional n-gram CONTAINMENT pairs: C(src→dst) =
    |shingles(src) ∩ shingles(dst)| / |shingles(src)| ≥ ``threshold``.

    The asymmetric sibling of ``ngram_jaccard_pairs`` — Jaccard misses
    the quote/subset case entirely (a 50-shingle doc fully embedded in
    a 5000-shingle doc has Jaccard ≈ 0.01 but containment 1.0), and
    containment is the standard detector for boilerplate inclusion,
    quotations and partial mirrors in LLM corpus curation (the
    "contained in" half of the decontamination literature's
    overlap taxonomy). Emits BOTH directions independently when both
    clear the threshold (src mostly-inside-dst and vice versa are
    different facts).

    Same scale architecture as the Jaccard op: inverted-index equi-join
    on shingle hashes with document-frequency pruning (``max_df`` caps
    any shingle's O(df²) candidate fan-out BEFORE the self-join;
    pruning affects candidate recall only — the emitted containment is
    recomputed exactly on the full shingle sets), candidate dedup, then
    two array-intersect recount joins. Never all-pairs; empty-shingle
    docs are excluded (containment undefined).

    ``collapse_exact`` (True/False/"auto" — the same dup-mass probe as
    the Jaccard op) collapses byte-identical texts before the inverted
    index and expands DIRECTIONALLY afterwards: a cross pair (A→B, c)
    replicates to every ordered member pair (identical texts ⇒
    identical shingle sets ⇒ identical containment), and intra pairs
    within a clone group are containment 1.0 in both directions —
    gated on the group having ≥ 1 KEPT (non-hot, nonempty) shingle,
    because identical docs pair in the direct path iff some shared
    shingle survives pruning, and this op's oracle mirrors the pruning.
    Document frequency is member-count-weighted so pruning decisions
    equal the direct path's at any depth (ADVICE r7, same basis as the
    Jaccard op). With ``expand_cap=None`` (default) output is
    row-identical AT ANY max_df; the collapse buys the CANDIDATE
    stage — the direct path pays d² array-intersect recounts per clone
    cluster, the collapsed path one — but the OUTPUT pair count stays
    d² (inherent to pair semantics).

    ``expand_cap`` (ADVICE r8) additionally bounds output
    MATERIALIZATION for pathologically deep clones, the directional
    analog of ``_expand_collapsed_pairs``' cap: each group's cross
    expansion uses its first ``expand_cap`` members (by id) and intra
    expansion chunks members into ``expand_cap``-sized bidirectional
    cliques joined by bidirectional connector edges between chunk
    leads — per-member degree O(expand_cap), linear total pairs, every
    clone cluster still one connected blob in both directions. The
    emitted pairs are then a REACHABILITY-PRESERVING SUBSET of the
    exact pair set (all emitted containments remain exact), no longer
    row-identical to the direct path — consumers that only need
    clusters should use the ``*_components`` APIs, which never expand
    at all. Only meaningful under collapse; the direct path ignores
    it."""
    df = _non_null_text(df, text_col)
    collapse_exact = _resolve_collapse_exact(
        df, F.md5(F.coalesce(F.col(text_col), F.lit(""))), collapse_exact, "text"
    )
    if collapse_exact:
        groups, members = _collapse_identical_text(df, id_col, text_col)
        gw = members.groupBy("_tkey").agg(F.count(F.lit(1)).alias("_dfw"))
        rep_pairs = ngram_containment_pairs(
            groups.join(gw, "_tkey"),
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            threshold=threshold,
            max_df=max_df,
            collapse_exact=False,
            _df_weight_col="_dfw",
        )
        # Intra eligibility must mirror the direct path EXACTLY: two
        # identical docs pair iff they share at least one KEPT shingle
        # (every shingle of the text hotter than max_df ⇒ no candidate
        # row survives the pruned inverted index ⇒ no pair — and this
        # op's oracle mirrors that pruning, unlike the Jaccard op's
        # unpruned all-pairs oracle). Gate on "group has ≥ 1 shingle
        # with member-weighted df ≤ max_df"; with pruning off this is
        # just the nonempty-shingle gate.
        sh_g = groups.select(
            "_tkey",
            F.explode(
                F.array_distinct(
                    shingle_hashes(tokenize(F.col(text_col)), shingle_n)
                )
            ).alias("_g"),
        )
        if max_df is not None:
            dfagg = (
                sh_g.join(gw, "_tkey")
                .groupBy("_g")
                .agg(F.sum("_dfw").alias("_df"))
            )
            hot = dfagg.filter(F.col("_df") > max_df).select("_g")
            eligible_keys = (
                sh_g.join(F.broadcast(hot), "_g", "left_anti")
                .select("_tkey")
                .distinct()
            )
        else:
            eligible_keys = sh_g.select("_tkey").distinct()
        rep_map = groups.select(F.col(id_col).alias("_rep"), "_tkey")
        if expand_cap is not None:
            wcap = Window.partitionBy("_tkey").orderBy("_mid")
            head = (
                members.withColumn("_rn", F.row_number().over(wcap))
                .filter(F.col("_rn") <= expand_cap)
                .drop("_rn")
            )
        else:
            head = members
        memb = head.join(rep_map, "_tkey").select("_rep", "_mid")
        msrc = memb.select(F.col("_rep").alias("src_id"), F.col("_mid").alias("_ms"))
        mdst = memb.select(F.col("_rep").alias("dst_id"), F.col("_mid").alias("_md"))
        cross = (
            rep_pairs.join(msrc, "src_id")
            .join(mdst, "dst_id")
            .select(
                F.col("_ms").alias("src_id"),
                F.col("_md").alias("dst_id"),
                "containment",
            )
        )
        if threshold <= 1.0:
            im = members.join(eligible_keys, "_tkey", "semi")
            one = F.lit(1.0).alias("containment")
            if expand_cap is None:
                ia = im.select("_tkey", F.col("_mid").alias("_ia"))
                ib = im.select("_tkey", F.col("_mid").alias("_ib"))
                intra = (
                    ia.join(ib, "_tkey")
                    .filter(F.col("_ia") != F.col("_ib"))
                    .select(
                        F.col("_ia").alias("src_id"),
                        F.col("_ib").alias("dst_id"),
                        one,
                    )
                )
            else:
                wcap = Window.partitionBy("_tkey").orderBy("_mid")
                ranked = im.withColumn("_rn", F.row_number().over(wcap)).withColumn(
                    "_chunk", F.floor((F.col("_rn") - 1) / expand_cap)
                )
                ia = ranked.select("_tkey", "_chunk", F.col("_mid").alias("_ia"))
                ib = ranked.select("_tkey", "_chunk", F.col("_mid").alias("_ib"))
                cliques = (
                    ia.join(ib, ["_tkey", "_chunk"])
                    .filter(F.col("_ia") != F.col("_ib"))
                    .select(
                        F.col("_ia").alias("src_id"),
                        F.col("_ib").alias("dst_id"),
                        one,
                    )
                )
                leads = ranked.filter((F.col("_rn") - 1) % expand_cap == 0).select(
                    "_tkey", "_chunk", F.col("_mid").alias("_lead")
                )
                nxt = leads.select(
                    "_tkey",
                    (F.col("_chunk") - 1).alias("_chunk"),
                    F.col("_lead").alias("_lead_next"),
                )
                ljoin = leads.join(nxt, ["_tkey", "_chunk"])
                connectors = ljoin.select(
                    F.col("_lead").alias("src_id"),
                    F.col("_lead_next").alias("dst_id"),
                    one,
                ).unionByName(
                    ljoin.select(
                        F.col("_lead_next").alias("src_id"),
                        F.col("_lead").alias("dst_id"),
                        one,
                    )
                )
                intra = cliques.unionByName(connectors)
            return cross.unionByName(intra)
        return cross
    sel = [
        F.col(id_col).alias("_id"),
        F.array_distinct(
            shingle_hashes(tokenize(F.col(text_col)), shingle_n)
        ).alias("_sh"),
    ]
    if _df_weight_col is not None:
        sel.append(F.col(_df_weight_col).cast("long").alias("_dfw"))
    # (A narrow-scan spread before this cache fill was A/B'd in r11 and
    # LOST at warm medians — the repartition + wide cache reads cost more
    # than the fill parallelism buys; the spread stays only in
    # substring_dup_spans, where it measured 1.5x.)
    shingled = _cache(df.select(*sel))
    nonempty = shingled.filter(F.size("_sh") > 0)
    inv = nonempty.select("_id", F.explode("_sh").alias("_g"))
    if max_df is not None:
        if _df_weight_col is not None:
            dfagg = (
                nonempty.select("_dfw", F.explode("_sh").alias("_g"))
                .groupBy("_g")
                .agg(F.sum("_dfw").alias("_df"))
            )
        else:
            dfagg = inv.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        hot = dfagg.filter(F.col("_df") > max_df).select("_g")
        inv = inv.join(F.broadcast(hot), "_g", "left_anti")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), "_g")
        .filter(F.col("a._id") != F.col("b._id"))
        .select(F.col("a._id").alias("src_id"), F.col("b._id").alias("dst_id"))
        .dropDuplicates(["src_id", "dst_id"])
    )
    sa = nonempty.select(F.col("_id").alias("src_id"), F.col("_sh").alias("_sha"))
    sb = nonempty.select(F.col("_id").alias("dst_id"), F.col("_sh").alias("_shb"))
    con = (
        cand.join(sa, "src_id")
        .join(sb, "dst_id")
        .withColumn("_common", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("containment", F.col("_common") / F.size("_sha"))
    )
    return con.filter(F.col("containment") >= threshold).select(
        "src_id", "dst_id", "containment"
    )
