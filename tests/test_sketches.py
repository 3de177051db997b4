"""Mergeable sketch guarantees (operators/sketches.py).

No DuckDB oracle exists for DataSketches, so the contracts are pinned
directly: accuracy vs exact answers computed on the same data,
mergeability (rollup-of-parts equals direct computation), and the
determinism boundary (HLL/theta order-insensitive; KLL only
rank-error-bounded).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esther_apache_spark_spark.operators import sketches as S
from esther_apache_spark_spark.schemas import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))


def test_hll_rollup_matches_direct_sketch_and_exact(spark, events):
    """Union-of-daily-sketches must give the SAME estimate as sketching
    the whole period directly (mergeability is lossless for HLL), and
    both must sit within the lgk=12 error envelope of the exact count."""
    daily = S.hll_bucket_sketches(events, "user_id", ["event_type", "day"])
    rolled = {
        r["event_type"]: r["distinct_est"]
        for r in S.hll_rollup(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["distinct_est"]
        for r in S.hll_rollup(
            S.hll_bucket_sketches(events, "user_id", ["event_type"]),
            ["event_type"],
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rolled == direct  # merge is lossless, estimates identical
    for t, est in rolled.items():
        assert est == pytest.approx(exact[t], rel=0.06), (t, est, exact[t])


def test_hll_estimate_partition_insensitive(spark, events):
    """Register-max construction: the estimate cannot depend on row
    order or partitioning — repartitioned input gives bit-equal output."""
    a = sorted(
        map(tuple, S.hll_rollup(S.hll_bucket_sketches(events, "user_id", ["event_type"]), ["event_type"]).collect())
    )
    b = sorted(
        map(
            tuple,
            S.hll_rollup(
                S.hll_bucket_sketches(events.repartition(7, "value"), "user_id", ["event_type"]),
                ["event_type"],
            ).collect(),
        )
    )
    assert a == b


def test_theta_overlap_tracks_exact_incidence(spark, events):
    """Theta overlap/Jaccard estimates vs the exact distinct-user
    incidence for every segment pair."""
    got = {
        (r["seg_a"], r["seg_b"]): r
        for r in S.theta_segment_overlap(events, "user_id", "event_type").collect()
    }
    inc = events.select("user_id", "event_type").distinct()
    a = inc.select("user_id", F.col("event_type").alias("seg_a"))
    b = inc.select("user_id", F.col("event_type").alias("seg_b"))
    exact_overlap = {
        (r["seg_a"], r["seg_b"]): r["n"]
        for r in a.join(b, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_sizes = {
        r["event_type"]: r["n"]
        for r in inc.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == set(exact_overlap)
    for (sa, sb), row in got.items():
        assert row["distinct_a"] == pytest.approx(exact_sizes[sa], rel=0.05)
        assert row["distinct_b"] == pytest.approx(exact_sizes[sb], rel=0.05)
        assert row["overlap_est"] == pytest.approx(
            exact_overlap[(sa, sb)], rel=0.12, abs=8
        )
        union_exact = (
            exact_sizes[sa] + exact_sizes[sb] - exact_overlap[(sa, sb)]
        )
        assert row["union_est"] == pytest.approx(union_exact, rel=0.06)


def test_kll_quantiles_within_rank_error(spark, events):
    """KLL promise: the estimated p-quantile's TRUE rank is within
    p ± eps for eps ≈ 1.65% at k=200 (asserted at 3x slack). Checked
    for both the one-shot sketch and a two-stage merged sketch — the
    merge must preserve the bound, not the exact estimate."""
    probs = [0.1, 0.5, 0.9]
    n_total = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type").count().withColumnRenamed("count", "cnt").collect()
    }

    def check(df):
        for row in df.collect():
            t = row["event_type"]
            for p, q in zip(probs, row["quantile_ests"]):
                true_rank = (
                    events.filter(
                        (F.col("event_type") == t) & (F.col("value") <= q)
                    ).count()
                    / n_total[t]
                )
                assert abs(true_rank - p) < 0.05, (t, p, q, true_rank)

    check(S.kll_group_quantiles(events, "value", ["event_type"], probs))

    # two-stage: per-day sketches merged up to event_type
    per_day = events.groupBy("event_type", "day").agg(
        F.kll_sketch_agg_double(F.col("value").cast("double"), F.lit(200)).alias("sk")
    )
    merged = per_day.groupBy("event_type").agg(
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("sk"),
            F.array(*[F.lit(p) for p in probs]),
        ).alias("quantile_ests")
    )
    check(merged)


def test_streaming_hll_equals_batch_twin(spark, sf_dir):
    """Completed streaming windowed HLL == batch twin, bit-for-bit:
    register-max merge across micro-batches is lossless, so chopping
    the input into file-source triggers cannot move an estimate."""
    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.streaming.events import (
        run_streaming_distinct_users_hll,
        windowed_distinct_users_hll,
    )

    got = sorted(
        map(tuple, run_streaming_distinct_users_hll(spark, sf_dir).collect())
    )
    batch = sorted(
        map(
            tuple,
            windowed_distinct_users_hll(
                load_table(spark, sf_dir, "events")
            ).collect(),
        )
    )
    assert got == batch and len(got) > 0


def test_bitmap_rollup_is_exact(spark, events):
    """Positional bitmaps: rollup-of-daily == direct == exact
    countDistinct — zero error, and the grand total works too."""
    from esther_apache_spark_spark.operators import sketches as S2

    daily = S2.bitmap_bucket_sketches(events, "user_id", ["event_type", "day"])
    rolled = {
        r["event_type"]: r["distinct_exact"]
        for r in S2.bitmap_rollup(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rolled == exact
    total = S2.bitmap_rollup(daily).collect()[0]["distinct_exact"]
    assert total == events.select("user_id").distinct().count()


def test_cms_overestimates_and_bounds_error(spark, events):
    """CMS point estimates: ≥ true count for EVERY key (collisions only
    add), and overshoot ≤ ⌈e·N/width⌉ (the Cormode-Muthukrishnan bound;
    deterministic md5 rows make this reproducible, not probabilistic,
    for a fixed corpus)."""
    import math

    width, depth = 2048, 4
    pages = S.cms_rollup(S.cms_bucket_pages(events, "user_id", ["day"],
                                            width=width, depth=depth))
    cand = events.select("user_id").distinct()
    est = {
        r["user_id"]: r["cms_count"]
        for r in S.cms_estimate(pages, cand, "user_id",
                                width=width, depth=depth).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = events.count()
    bound = math.ceil(math.e * n_total / width)
    assert set(est) == set(exact)
    for uid, e in est.items():
        assert e >= exact[uid], (uid, e, exact[uid])
        assert e - exact[uid] <= bound, (uid, e, exact[uid], bound)


def test_cms_daily_merge_equals_direct_build(spark, events):
    """Merging per-day pages must yield the identical sketch (integer
    addition is exact) as building one global sketch directly."""
    daily = S.cms_rollup(S.cms_bucket_pages(events, "user_id", ["day"]))
    direct = S.cms_bucket_pages(events.withColumn("g", F.lit(1)), "user_id", ["g"]).drop("g")
    key = lambda r: (r["cms_row"], r["cms_slot"])
    a = {key(r): r["cms_cnt"] for r in daily.collect()}
    b = {key(r): r["cms_cnt"] for r in direct.collect()}
    assert a == b


def test_cms_empty_keys_and_unseen_key(spark, events):
    """Edges: probing with an empty key frame yields an empty result
    (not an error); probing a key never inserted yields a count that is
    only ever hash-collision noise (≥ 0, ≤ the global bound)."""
    pages = S.cms_rollup(S.cms_bucket_pages(events, "user_id", ["day"]))
    empty = spark.createDataFrame([], "user_id long")
    assert S.cms_estimate(pages, empty, "user_id").count() == 0
    ghost = spark.createDataFrame([(999_999_999,)], "user_id long")
    [row] = S.cms_estimate(pages, ghost, "user_id").collect()
    assert row["cms_count"] >= 0
    # the promised upper bound: collision noise stays within the
    # standard CMS guarantee ceil(e * N / width), same bound as
    # test_cms_overestimates_and_bounds_error
    import math

    assert row["cms_count"] <= math.ceil(math.e * events.count() / 2048)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from esther_apache_spark_spark.operators.sketches import (
        bloom_might_contain,
        bloom_words,
    )
    from pyspark.sql import functions as F

    members = spark.createDataFrame([(f"key{i}",) for i in range(500)], "k string")
    others = spark.createDataFrame([(f"other{i}",) for i in range(2000)], "k string")
    words = bloom_words(members, "k", m_bits=16384, k_hashes=7)
    # every inserted key flags (no false negatives — the Bloom contract)
    got = bloom_might_contain(members, "k", words, m_bits=16384, k_hashes=7)
    assert got.filter(~F.col("might_contain")).count() == 0
    # false positives exist at a bounded, DETERMINISTIC rate
    fp = bloom_might_contain(others, "k", words, m_bits=16384, k_hashes=7)
    n_fp = fp.filter(F.col("might_contain")).count()
    assert n_fp < 2000 * 0.05  # m/n=32.8 bits/key, k=7 -> well under 5%
    n_fp2 = bloom_might_contain(
        others.repartition(5), "k", words, m_bits=16384, k_hashes=7
    ).filter(F.col("might_contain")).count()
    assert n_fp == n_fp2  # same FP set under any partitioning


def test_bloom_words_merge_by_bit_or(spark):
    """Filters built on disjoint batches merge into exactly the filter
    of the union — the persist-daily/merge-on-read sketch contract."""
    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators.sketches import bloom_words

    a = spark.createDataFrame([(f"key{i}",) for i in range(250)], "k string")
    b = spark.createDataFrame([(f"key{i}",) for i in range(250, 500)], "k string")
    union_words = {
        r["word_idx"]: r["word"]
        for r in bloom_words(a.union(b), "k", m_bits=4096, k_hashes=5).collect()
    }
    merged = (
        bloom_words(a, "k", m_bits=4096, k_hashes=5)
        .union(bloom_words(b, "k", m_bits=4096, k_hashes=5))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    got = {r["word_idx"]: r["word"] for r in merged.collect()}
    assert got == union_words


def test_bloom_contains_expr_matches_join_form(spark):
    """The inline-expression membership (streaming form) must agree with
    the join-based bloom_might_contain on every key — same bit layout,
    same md5 positions, byte-for-byte."""
    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators.sketches import (
        bloom_contains_expr,
        bloom_might_contain,
        bloom_words,
        bloom_words_dense,
    )

    members = spark.createDataFrame([(f"k{i}",) for i in range(300)], "k string")
    probes = spark.createDataFrame([(f"k{i}",) for i in range(0, 900, 2)], "k string")
    words = bloom_words(members, "k", m_bits=8192, k_hashes=5)
    dense = bloom_words_dense(words, 8192)
    via_join = {
        r["k"]: r["might_contain"]
        for r in bloom_might_contain(probes, "k", words, m_bits=8192, k_hashes=5).collect()
    }
    via_expr = {
        r["k"]: r["f"]
        for r in probes.select(
            "k", bloom_contains_expr(F.col("k"), dense, 8192, k_hashes=5).alias("f")
        ).collect()
    }
    assert via_join == via_expr
    assert all(via_expr[f"k{i}"] for i in range(0, 300, 2))  # no false negatives


def test_streaming_bloom_novelty_is_stateless(spark, sf_dir):
    """The novelty gate's whole point: membership is an inline
    expression, so the streaming query must run with ZERO stateful
    operators (nothing grows with stream length) and must equal the
    batch replay of the same filter."""
    import uuid

    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators import sketches as SK
    from esther_apache_spark_spark.operators.sampling import hash_bucket
    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.streaming.events import streaming_events_source

    hist = load_table(spark, sf_dir, "events").filter(
        hash_bucket(F.col("event_id"), salt="hist") < int(0.5 * (1 << 32))
    )
    dense = SK.bloom_words_dense(
        SK.bloom_words(hist, "event_id", m_bits=131072, k_hashes=7, salt="sbloom"),
        131072,
    )
    flt = ~SK.bloom_contains_expr(F.col("event_id"), dense, 131072, 7, salt="sbloom")
    name = f"bloom_stateless_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_events_source(spark, sf_dir)
        .filter(flt)
        .select("event_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    assert progress is not None and not progress["stateOperators"]  # zero state
    streamed = {r["event_id"] for r in spark.table(name).collect()}
    batch = {
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").filter(flt).select("event_id").collect()
    }
    assert streamed == batch


def test_bloom_probe_null_keys_never_flag(spark):
    """A NULL probe key has NULL positions → no word matches → flag
    false (it cannot be a member), and the row still comes back."""
    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators.sketches import (
        bloom_might_contain,
        bloom_words,
    )

    members = spark.createDataFrame([("a",), ("b",)], "k string")
    words = bloom_words(members, "k", m_bits=4096, k_hashes=5)
    probes = spark.createDataFrame([("a",), (None,)], "k string")
    got = {
        r["k"]: r["might_contain"]
        for r in bloom_might_contain(probes, "k", words, m_bits=4096, k_hashes=5).collect()
    }
    assert got == {"a": True, None: False}


def test_hll_det_accuracy_and_salt_independence(spark, sf_dir):
    """hll_det_estimate: estimates track exact distinct counts within a
    generous multiple of the p=9 standard error (1.04/sqrt(512) ≈ 4.6%)
    across different salts (each salt is an independent hash family),
    and repartitioning never moves a single estimate (register-max
    algebra)."""
    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators.sketches import hll_det_estimate
    from esther_apache_spark_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r[0]: r[1]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("c"))
        .collect()
    }
    for salt in ("hll1|", "hll2|", "hll3|"):
        est = {
            r[0]: r[1]
            for r in hll_det_estimate(
                orders, "o_custkey", ["o_orderpriority"], p=9, salt=salt
            ).collect()
        }
        for k, ex in exact.items():
            assert abs(est[k] - ex) <= max(5, 5 * 0.046 * ex), (salt, k, est[k], ex)
        est2 = {
            r[0]: r[1]
            for r in hll_det_estimate(
                orders.repartition(5), "o_custkey", ["o_orderpriority"], p=9, salt=salt
            ).collect()
        }
        assert est == est2
