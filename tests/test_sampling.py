"""Deterministic sampling invariants: reproducibility, disjoint covering
splits, and approximate fraction sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from esther_apache_spark_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)
from esther_apache_spark_spark.schemas import load_table


def test_hash_sample_reproducible_and_sized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs.repartition(7), "doc_id", 0.3).select("doc_id").collect()}
    assert a == b  # identical set under different partitioning
    assert abs(len(a) / n - 0.3) < 0.08  # binomial tolerance at sf0.001 (500 docs)


def test_train_test_split_disjoint_covering(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, test = train_test_split(docs, "doc_id", test_fraction=0.2)
    n, ntr, nte = docs.count(), train.count(), test.count()
    assert ntr + nte == n
    ids_tr = {r["doc_id"] for r in train.select("doc_id").collect()}
    ids_te = {r["doc_id"] for r in test.select("doc_id").collect()}
    assert not (ids_tr & ids_te)
    assert abs(nte / n - 0.2) < 0.08


def test_stratified_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.8}, default_fraction=0.0)
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs == {"en"}  # default 0 excludes every other stratum
    n_en = docs.filter(docs.lang == "en").count()
    assert abs(got.count() / n_en - 0.8) < 0.12


def test_temperature_sample_upweights_tail_strata(spark, sf_dir):
    """α=0.5 temperature sampling: the largest language keeps 100% of
    its rows (rate normalizes to 1), every stratum's realized keep-rate
    tracks (n_l/n_max)^0.5 — i.e. strictly MORE than proportional
    sampling would keep for tail languages — and the selected set is
    reproducible."""
    from esther_apache_spark_spark.operators.sampling import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = temperature_sample(docs, "doc_id", "lang", alpha=0.5)
    after = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_max = max(before.values())
    top = max(before, key=lambda k: before[k])
    assert after[top] == before[top]  # rate 1.0 → everything kept
    for lang, n in before.items():
        expected = (n / n_max) ** 0.5
        realized = after.get(lang, 0) / n
        assert abs(realized - expected) < 0.25, (lang, realized, expected)
        # tail strata keep more than proportional sampling would
        if n < n_max:
            assert realized > (n / n_max) - 0.05
    again = temperature_sample(docs, "doc_id", "lang", alpha=0.5)
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from esther_apache_spark_spark.operators.sampling import weighted_sample

    rows = [(i, 100 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = [r["doc_id"] for r in weighted_sample(df, "doc_id", F.col("w"), k=50).collect()]
    b = [r["doc_id"] for r in weighted_sample(df.repartition(7), "doc_id", F.col("w"), k=50).collect()]
    assert a == b  # identical ordered sample under any partitioning
    # heavy rows (w=100, 10% of population) must dominate the sample
    heavy = sum(1 for d in a if d < 50)
    assert heavy > 25
    # redraw with a different salt gives a different sample
    c = [r["doc_id"] for r in weighted_sample(df, "doc_id", F.col("w"), k=50, salt="other").collect()]
    assert a != c
    # zero/negative weights are never sampled
    dfz = spark.createDataFrame([(1, 0), (2, -5), (3, 10)], "doc_id long, w long")
    got = {r["doc_id"] for r in weighted_sample(dfz, "doc_id", F.col("w"), k=3).collect()}
    assert got == {3}


def test_weighted_sample_topk_plan_shape(spark):
    from esther_apache_spark_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i, i + 1) for i in range(100)], "doc_id long, w long")
    plan = weighted_sample(df, "doc_id", F.col("w"), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
