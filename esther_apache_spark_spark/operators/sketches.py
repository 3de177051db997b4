"""Mergeable sketches (Apache DataSketches via Spark 4 built-ins) —
the 100 TB pattern for distinct counts, set overlap, and quantiles.

Engine extension (no reference citation; the reference's only distinct
count is exact ``countDistinct``). At fact-table scale the winning
shape is NOT "compute the metric over the raw data each time" but
"pre-aggregate a *mergeable* sketch per partition/day/segment once,
then answer any coarser rollup by merging sketches" — the sketch column
is a few KB regardless of cardinality, so a year-over-year distinct is
a union over 365 tiny binaries instead of a re-scan of the year.

Four families, all JVM-side aggregates (no Python in the path):

- **HLL** (``hll_sketch_agg`` / ``hll_union_agg``): distinct counts.
  Register-max construction → insertion-order- and partition-
  insensitive, so estimates are deterministic and catalog queries over
  them survive the partition-determinism audit.
- **Theta** (``theta_sketch_agg`` + ``theta_union/intersection/
  difference``): distinct counts WITH set algebra — audience overlap
  between segments without an exact (user, segment) self-join.
  k-smallest-hashes construction → also order-insensitive.
- **KLL** (``kll_sketch_agg_double`` + ``kll_sketch_merge_double``):
  mergeable quantiles. NOTE: unlike HLL/theta, KLL estimates DEPEND on
  merge order (compaction is sampling-based), so changing shuffle
  partitioning can move an estimate within its rank-error bound —
  callers must treat results as (value, ±rank_error), never as
  deterministic scalars. That is why KLL has no catalog query: the
  catalog pins rows-only queries to partition-count determinism, which
  KLL honestly cannot promise. Guarantees are property-tested instead.
- **Positional bitmaps** (``bitmap_construct_agg`` / ``bitmap_or_agg``):
  the EXACT mergeable twin for integer keys — zero error, fully
  SQL-oracle-able, state proportional to the key space instead of
  HLL's fixed few KB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_bucket_sketches(
    df: DataFrame, key_col: str, bucket_cols: list[str], lgk: int = 12
) -> DataFrame:
    """One HLL sketch of ``key_col`` per bucket — the pre-aggregate you
    persist. ``lgk`` = log2 of registers (12 → 4 KB, ~1.6% rel. std
    err). One partial-aggregable shuffle on the bucket keys; sketch
    payloads, not raw keys, cross the wire for the final merge."""
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll_sketch")
    )


def hll_rollup(
    sketches: DataFrame, rollup_cols: list[str] | None = None
) -> DataFrame:
    """Merge persisted bucket sketches up to ``rollup_cols`` granularity
    (None/[] → grand total). Input is the output of
    ``hll_bucket_sketches`` — the raw data is NOT re-read."""
    groups = rollup_cols or []
    agg = (
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll_sketch")))
        .alias("distinct_est")
    )
    if groups:
        return sketches.groupBy(*groups).agg(agg)
    return sketches.agg(agg)


def theta_segment_overlap(
    df: DataFrame, key_col: str, segment_col: str
) -> DataFrame:
    """Pairwise distinct-key overlap between every two segment values:
    per-segment theta sketches (one shuffle on segment), then sketch
    set-algebra on the tiny per-segment frame — estimates of |A|, |B|,
    |A∩B|, |A∪B| and Jaccard, without the exact (key, segment)
    incidence self-join (`audience_overlap_matrix`) whose input grows
    with the key universe. The self-join here is over #segments rows.
    """
    sk = df.groupBy(segment_col).agg(
        F.theta_sketch_agg(F.col(key_col)).alias("sk")
    )
    a = sk.select(F.col(segment_col).alias("seg_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col(segment_col).alias("seg_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
    )
    union = F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b")))
    return pairs.select(
        "seg_a",
        "seg_b",
        F.theta_sketch_estimate(F.col("sk_a")).alias("distinct_a"),
        F.theta_sketch_estimate(F.col("sk_b")).alias("distinct_b"),
        inter.alias("overlap_est"),
        union.alias("union_est"),
        F.round(inter / union, 6).alias("jaccard_est"),
    )


def kll_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
    k: int = 200,
) -> DataFrame:
    """Per-group mergeable quantile estimates: one KLL sketch per group
    (k=200 → ~1.65% rank error, few-KB state), quantiles read off the
    sketch. The sketch column could equally be persisted per partition
    and merged later (``kll_sketch_merge_double``) — same error bound.
    Estimates are rank-error-bounded, NOT deterministic under
    re-partitioning (see module docstring)."""
    quantiles = F.kll_sketch_get_quantile_double(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)),
        F.array(*[F.lit(float(p)) for p in probs]),
    )
    out = df.groupBy(*group_cols).agg(
        quantiles.alias("quantile_ests"),
        F.count(value_col).alias("n"),
    )
    return out


def bitmap_bucket_sketches(
    df: DataFrame, key_col: str, bucket_cols: list[str]
) -> DataFrame:
    """EXACT mergeable distinct state: positional bitmaps over an
    integer key, one row per (bucket, bitmap-bucket). The key space is
    chunked into 32768-bit buckets (``bitmap_bucket_number``); each
    bucket's 4 KB bitmap records exactly which positions occurred.
    Mergeable by OR — the exact-count twin of the HLL sketch: bigger
    state (proportional to key-space/8 bytes per bucket combination,
    vs HLL's fixed 4 KB) but zero error and still order/partition-
    insensitive. The 100 TB shape: persist per-day bitmaps, answer any
    period's exact distinct by OR-merge without re-reading raw data."""
    return df.groupBy(
        *bucket_cols,
        F.expr(f"bitmap_bucket_number({key_col})").alias("bitmap_bucket"),
    ).agg(
        F.expr(f"bitmap_construct_agg(bitmap_bit_position({key_col}))").alias(
            "bitmap"
        )
    )


def bitmap_rollup(
    bitmaps: DataFrame, rollup_cols: list[str] | None = None
) -> DataFrame:
    """OR-merge persisted bitmaps up to ``rollup_cols`` granularity and
    count bits — the EXACT distinct count (None/[] → grand total)."""
    groups = rollup_cols or []
    merged = bitmaps.groupBy(*groups, "bitmap_bucket").agg(
        F.expr("bitmap_or_agg(bitmap)").alias("bitmap")
    )
    agg = F.sum(F.expr("bitmap_count(bitmap)")).cast("long").alias("distinct_exact")
    if groups:
        return merged.groupBy(*groups).agg(agg)
    return merged.agg(agg)


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable per-key frequency estimates.
# ---------------------------------------------------------------------------

def cms_slot(key: Column, row: int, width: int, salt: str = "cms") -> Column:
    """Counter slot for ``key`` in hash row ``row``: the md5 uint32
    bucket (bit-identical in Spark and DuckDB — same construction as
    ``sampling.hash_bucket``) reduced mod ``width``. Each row uses an
    independent hash via the ``salt‖row:`` prefix."""
    h = F.md5(F.concat(F.lit(f"{salt}{row}:"), key.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def cms_bucket_pages(
    df: DataFrame,
    key_col: str,
    bucket_cols: list[str],
    width: int = 2048,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch per bucket, stored as sparse counter pages:
    one row per (bucket, cms_row, cms_slot) with its exact hit count —
    the frequency-estimation member of the mergeable-sketch family
    (HLL=distinct, theta=overlap, KLL=quantiles, bitmap=exact distinct,
    CMS=per-key counts). State is ≤ depth·width rows per bucket no
    matter how many distinct keys stream through, and pages merge by
    plain integer addition, so per-day pages answer any period's
    frequency query without re-reading raw data.

    Unlike HLL/KLL this is FULLY deterministic (md5 rows, integer
    counts — no estimator randomness), so CMS queries carry complete
    DuckDB value-hash oracles. One partial-aggregable shuffle of
    (bucket, row, slot) triples; raw keys never cross the wire."""
    slots = F.array(
        *[cms_slot(F.col(key_col), j, width, salt) for j in range(depth)]
    )
    return (
        df.select(*bucket_cols, F.posexplode(slots).alias("cms_row", "cms_slot"))
        .groupBy(*bucket_cols, "cms_row", "cms_slot")
        .agg(F.count(F.lit(1)).alias("cms_cnt"))
    )


def cms_rollup(
    pages: DataFrame, rollup_cols: list[str] | None = None
) -> DataFrame:
    """Merge counter pages up to ``rollup_cols`` granularity (None/[] →
    grand total): CMS merge is elementwise addition, exactly SUM over
    the page rows — associative/commutative, so partition- and
    order-insensitive."""
    groups = rollup_cols or []
    return pages.groupBy(*groups, "cms_row", "cms_slot").agg(
        F.sum("cms_cnt").alias("cms_cnt")
    )


def cms_estimate(
    pages: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every key in ``keys`` (must carry
    ``key_col``; pages must already be rolled up to a single logical
    sketch — no extra bucket columns). Returns ``keys`` plus
    ``cms_count`` = min over the depth rows of the key's slot counters
    (missing page → 0). Guarantees: ``cms_count ≥ true_count`` always
    (hash collisions only ever add), and the overshoot is ≤ ⌈e·N/width⌉
    with probability 1−(1/e)^depth (Cormode & Muthukrishnan 2005) —
    both pinned in tests/test_sketches.py.

    Plan shape: the key side explodes to depth rows per key and joins
    pages on (cms_row, cms_slot) — an equi-join on a ≤ depth·width-row
    relation, which AQE broadcasts; the min-of-depth is one hash
    aggregate on the key."""
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[cms_slot(F.col(key_col), j, width, salt) for j in range(depth)])
        ).alias("cms_row", "cms_slot"),
    )
    joined = probes.join(pages, ["cms_row", "cms_slot"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cms_cnt"), F.lit(0))).alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch.
# ---------------------------------------------------------------------------

def bloom_words(
    df: DataFrame,
    key_col: str,
    m_bits: int = 131072,
    k_hashes: int = 7,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as sparse 60-bit words:
    one row per (word_idx, word) — the set-MEMBERSHIP member of the
    mergeable-sketch family (HLL=distinct, theta=overlap,
    KLL=quantiles, bitmap=exact distinct, CMS=counts, Bloom=contains).
    Positions are the ``cms_slot`` md5 construction (independent hash
    per ``salt‖i:`` prefix), words pack 60 bits so every shift stays in
    non-negative signed-64 territory — bit-identical in Spark and
    DuckDB BIGINT, making membership (INCLUDING the deterministic
    false-positive set) fully SQL-replayable. Filters over the same
    (m_bits, k_hashes, salt) merge by per-word ``bit_or``.

    State is ≤ ceil(m_bits/60) rows regardless of key count — a
    CONSTANT of the model, so the words frame is broadcastable by
    contract. FP rate ≈ (1 - e^(-k·n/m))^k; size m for the expected
    distinct n (m/n = 18.7 bits/key at the defaults → ~0.1%)."""
    if m_bits <= 0 or k_hashes <= 0:
        raise ValueError("m_bits and k_hashes must be positive")
    pos = F.explode(
        F.array(*[cms_slot(F.col(key_col), i, m_bits, salt) for i in range(k_hashes)])
    ).alias("_pos")
    return (
        df.select(pos)
        .select(
            F.expr("_pos DIV 60").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 60) AS INT))").alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("word"))
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int = 131072,
    k_hashes: int = 7,
    salt: str = "bloom",
    flag_col: str = "might_contain",
) -> DataFrame:
    """Append ``flag_col``: true iff ALL ``k_hashes`` of the key's bits
    are set in the filter (no false negatives; false positives at the
    sized rate, deterministically — the same keys flag on every engine
    and run). The words frame is bounded by the m_bits model constant →
    broadcast join; each probe key explodes into k (word_idx, mask)
    lookups and re-groups, so the probe side never shuffles its
    payload, only (key, word_idx) pairs."""
    probes = df.select(F.col(key_col).alias("_k")).distinct()
    expl = probes.select(
        "_k",
        F.explode(
            F.array(*[cms_slot(F.col("_k"), i, m_bits, salt) for i in range(k_hashes)])
        ).alias("_pos"),
    ).select(
        "_k",
        F.expr("_pos DIV 60").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 60) AS INT))").alias("_m"),
    )
    # bounded by the model constant ceil(m_bits/60) — broadcast contract
    hit = expl.join(F.broadcast(words), "word_idx", "left").select(
        "_k",
        (F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("_m")) != 0)).alias("_hit"),
    )
    flags = hit.groupBy("_k").agg(
        (F.count(F.lit(1)) == F.sum(F.when(F.col("_hit"), 1).otherwise(0))).alias(flag_col)
    )
    return df.join(
        flags, df[key_col] == flags["_k"], "left"
    ).drop("_k").fillna({flag_col: False})


def bloom_words_dense(words: DataFrame, m_bits: int) -> list[int]:
    """Collect a ``bloom_words`` frame into a dense Python word list
    (missing indices = 0). Driver-side by CONTRACT: the list length is
    ``ceil(m_bits/60)`` — a model constant independent of how many keys
    were inserted — the same boundedness argument as broadcasting the
    frame, needed when the filter must be an inline EXPRESSION (e.g.
    a streaming filter, where a join-per-probe is unavailable)."""
    n = (m_bits + 59) // 60
    dense = [0] * n
    for r in words.collect():
        dense[int(r["word_idx"])] = int(r["word"])
    return dense


_BLOOM_BIT_MASKS = None


def bloom_contains_expr(
    key: Column,
    dense_words: list[int],
    m_bits: int,
    k_hashes: int = 7,
    salt: str = "bloom",
) -> Column:
    """Membership test as a PURE column expression against a dense word
    list literal — no join, no state; usable in streaming filters. True
    iff all ``k_hashes`` bits are set (same bit layout and md5 position
    construction as ``bloom_words``, so SQL oracles replay it exactly,
    false positives included)."""
    words_arr = F.array(*[F.lit(int(w)) for w in dense_words])
    masks_arr = F.array(*[F.lit(1 << b) for b in range(60)])
    cond = None
    for i in range(k_hashes):
        p = cms_slot(key, i, m_bits, salt)
        widx = F.floor(p / F.lit(60)).cast("int")
        mask = F.element_at(masks_arr, F.pmod(p, 60).cast("int") + F.lit(1))
        word = F.element_at(words_arr, widx + F.lit(1))
        c = word.bitwiseAND(mask) != 0
        cond = c if cond is None else cond & c
    return cond


# ---------------------------------------------------------------------------
# Deterministic (SQL-replayable) HyperLogLog — the oracle-able twin of
# the DataSketches HLL above.
# ---------------------------------------------------------------------------

def hll_det_estimate(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 9,
    salt: str = "hll1|",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Classic Flajolet HLL with every source of nondeterminism removed,
    so a DuckDB oracle replays it bit-for-bit (unlike
    ``hll_bucket_sketches``, whose xxhash-based DataSketches registers
    are JVM-internal):

    - the item hash is the md5-hex→BIGINT family (``dedup.md5_long``
      construction, 60 bits) — identical in both engines;
    - register index = ``h & (m-1)``, rank input = ``h >> p`` (51 bits
      at p=9), rho = ``(60-p+1) - length(trim(LEADING '0' FROM
      bin(w)))`` — pure integer/string ops;
    - the register-sum ``Σ 2^-M_j`` is kept EXACT by scaling to
      ``Σ 2^(maxrho - M_j)`` in BIGINT (≤ m·2^52 = 2^61 at p=9, no
      float ordering anywhere);
    - the only float math is one literal-driven multiply/divide for the
      raw estimate and ``m·ln(m/V)`` linear counting (V = empty
      registers, an exact integer), rounded to a BIGINT count.

    Scale shape: one partial-aggregable shuffle on (group, register) —
    m·|groups| keys — then an m-row-per-group fold; the raw keys never
    cross the wire twice. Register-max construction makes the result
    insertion-order- and partition-count-invariant by algebra, and the
    exact-integer state makes it cross-engine reproducible, so the
    estimate can sit in an oracled catalog query instead of a rows-only
    one. Relative std error ≈ 1.04/sqrt(m) (~4.6% at p=9)."""
    m = 1 << p
    maxrho = 60 - p + 1
    from esther_apache_spark_spark.operators.dedup import md5_long

    h = md5_long(F.col(key_col).cast("string"), salt=salt)
    hashed = df.select(*group_cols, h.alias("h_"))
    regs = hashed.select(
        *group_cols,
        F.col("h_").bitwiseAND(m - 1).alias("idx"),
        (
            F.lit(maxrho)
            - F.length(F.expr(f"trim(LEADING '0' FROM bin(shiftright(h_, {p})))"))
        ).alias("rho"),
    )
    regmax = regs.groupBy(*group_cols, "idx").agg(F.max("rho").alias("mx"))
    grid = (
        df.select(*group_cols)
        .distinct()
        .withColumn("idx", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
    )
    filled = grid.join(regmax, on=[*group_cols, "idx"], how="left").select(
        *group_cols, F.coalesce(F.col("mx"), F.lit(0)).alias("mx")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = filled.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {maxrho} - mx)")).alias("s"),
        F.sum(F.when(F.col("mx") == 0, 1).otherwise(0)).alias("v"),
    )
    raw = alpha * F.lit(float(m * m)) * F.lit(float(1 << maxrho)) / F.col("s").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.floor(est + F.lit(0.5)).cast("long").alias(out_col)
    )
