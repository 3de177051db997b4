"""Deterministic sampling invariants: reproducibility, disjoint covering
splits, and approximate fraction sizing."""

from __future__ import annotations

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
