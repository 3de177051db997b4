"""Sequence-packing invariants: the distributed exclusive prefix sum
matches a window cumsum under any partitioning, packed fragments
reassemble the corpus exactly, and the leakage-safe split never lets a
near-dup pair straddle train/test."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esther_apache_spark_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)
from esther_apache_spark_spark.schemas import load_table


def _doc_lengths(spark, sf_dir):
    from esther_apache_spark_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("tok_len")
    )


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_exclusive_prefix_sum_matches_window_cumsum(spark, sf_dir, parts):
    d = _doc_lengths(spark, sf_dir)
    got = {
        r["doc_id"]: r["off"]
        for r in exclusive_prefix_sum(
            d, [F.col("doc_id")], "tok_len", out_col="off", num_partitions=parts
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["off"]
        for r in d.withColumn(
            "off", F.coalesce(F.sum("tok_len").over(w), F.lit(0))
        ).collect()
    }
    assert got == want  # bit-identical offsets regardless of partition count


def test_exclusive_prefix_sum_input_partitioning_invariant(spark, sf_dir):
    d = _doc_lengths(spark, sf_dir)
    a = exclusive_prefix_sum(d, [F.col("doc_id")], "tok_len").collect()
    b = exclusive_prefix_sum(
        d.repartition(11), [F.col("doc_id")], "tok_len"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_sequences_reassembles_corpus(spark, sf_dir):
    seq_len = 128
    d = _doc_lengths(spark, sf_dir)
    frags = pack_sequences(d, [F.col("doc_id")], "tok_len", seq_len=seq_len)
    rows = frags.collect()
    total = d.agg(F.sum("tok_len")).collect()[0][0]

    # 1. Per-document: fragments tile [0, tok_len) contiguously, in seq order.
    lens = {r["doc_id"]: r["tok_len"] for r in d.collect()}
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, fr in by_doc.items():
        fr.sort(key=lambda r: r["seq_id"])
        pos = 0
        for f in fr:
            assert f["slice_start"] == pos
            assert f["slice_len"] >= 1
            pos += f["slice_len"]
        assert pos == lens[doc_id]
    # Zero-length docs contribute nothing; every positive-length doc appears.
    assert set(by_doc) == {k for k, v in lens.items() if v > 0}

    # 2. Per-sequence: fragments tile [0, seq_len) exactly; every sequence
    #    but the last is full; seq ids are 0..n_seq-1 dense.
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    n_seq = (total + seq_len - 1) // seq_len
    assert set(by_seq) == set(range(n_seq))
    for sid, fr in sorted(by_seq.items()):
        fr.sort(key=lambda r: r["seq_pos"])
        pos = 0
        for f in fr:
            assert f["seq_pos"] == pos
            pos += f["slice_len"]
        assert pos == (seq_len if sid < n_seq - 1 else total - seq_len * (n_seq - 1))


def test_pack_sequences_long_doc_spans_many_sequences(spark):
    # One 1000-token doc among shorts: must explode into ceil spans with
    # correct intra-doc slicing (the start>stop sequence() guard's edge).
    d = spark.createDataFrame(
        [Row(doc_id=1, tok_len=5), Row(doc_id=2, tok_len=1000), Row(doc_id=3, tok_len=0), Row(doc_id=4, tok_len=3)]
    )
    got = pack_sequences(d, [F.col("doc_id")], "tok_len", seq_len=100).collect()
    doc2 = sorted((r for r in got if r["doc_id"] == 2), key=lambda r: r["seq_id"])
    assert len(doc2) == 11  # tokens 5..1004 overlap sequences 0..10
    assert doc2[0]["slice_start"] == 0 and doc2[0]["slice_len"] == 95
    assert all(f["slice_len"] == 100 for f in doc2[1:-1])
    assert doc2[-1]["slice_len"] == 5 and doc2[-1]["seq_pos"] == 0
    assert not [r for r in got if r["doc_id"] == 3]  # zero-length: no fragments


def test_pack_sequences_rejects_bad_seq_len(spark):
    d = spark.createDataFrame([Row(doc_id=1, tok_len=5)])
    with pytest.raises(ValueError):
        pack_sequences(d, [F.col("doc_id")], "tok_len", seq_len=0)


def test_leakage_safe_split_keeps_neardup_pairs_together(spark, sf_dir):
    from esther_apache_spark_spark.operators import dedup as D
    from esther_apache_spark_spark.plans.corpus_ops import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    split = {r["doc_id"]: r["split"] for r in leakage_safe_split(spark, sf_dir).collect()}
    assert set(split) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    pairs = D.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.5).collect()
    assert pairs  # fixture plants near-dups; vacuity guard
    for p in pairs:
        assert split[p["id_a"]] == split[p["id_b"]]
    sides = set(split.values())
    assert sides <= {"train", "test"} and "train" in sides


def test_exclusive_prefix_sum_null_weights_contribute_zero(spark):
    """NULL weights must behave like the SQL window SUM (skipped): the
    NULL row keeps the running prefix as its own offset and adds
    nothing to later rows — a raw cumsum would turn every later offset
    into NaN."""
    d = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, None), (5, 7)], "doc_id long, w long"
    )
    got = {
        r["doc_id"]: r["off"]
        for r in exclusive_prefix_sum(
            d, [F.col("doc_id")], "w", out_col="off", num_partitions=3
        ).collect()
    }
    assert got == {1: 0, 2: 10, 3: 10, 4: 15, 5: 15}
