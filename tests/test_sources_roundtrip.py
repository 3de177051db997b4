"""Round-trip tests for the format matrix beyond parquet: ORC and
JSON-lines readers/writers preserve schema and values exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from esther_apache_spark_spark.schemas import TESTDATA, load_table
from esther_apache_spark_spark.sources.readers import read_json_lines, read_orc
from esther_apache_spark_spark.sources.sinks import write_json_lines, write_orc


def _canon_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_orc")
    write_orc(nation, out)
    back = read_orc(spark, out, TESTDATA["nation"])
    assert back.schema == nation.schema
    assert _canon_rows(back) == _canon_rows(nation)


def test_orc_partitioned_layout(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_orc")
    write_orc(cust, out, partition_by="c_mktsegment")
    import os

    parts = [d for d in os.listdir(out) if d.startswith("c_mktsegment=")]
    assert len(parts) >= 2, parts
    back = spark.read.orc(out)
    assert back.count() == cust.count()
    # partition pruning: a filter on the partition column reads one dir
    one = back.filter(F.col("c_mktsegment") == parts[0].split("=")[1])
    assert one.count() > 0


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_jsonl")
    write_json_lines(region, out)
    back = read_json_lines(spark, out, TESTDATA["region"])
    assert back.schema == region.schema
    assert _canon_rows(back) == _canon_rows(region)


def test_json_lines_permissive_captures_corrupt_rows(spark, tmp_path):
    """Dirty ingest (the reference's negative-price/uncastable theme at
    read time): malformed JSON lines land in _corrupt_record; clean rows
    parse; nothing is silently dropped."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from esther_apache_spark_spark.sources.readers import (
        read_json_lines_with_rejects,
    )

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{broken json!!\n"
        '{"id": 2, "name": "fine"}\n'
        'not even close\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = read_json_lines_with_rejects(spark, str(p), schema).cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    rejects = df.filter(F.col("_corrupt_record").isNotNull())
    assert df.count() == 4
    assert clean.count() == 2
    assert sorted(r["id"] for r in clean.collect()) == [1, 2]
    assert rejects.count() == 2
    # rejects carry the original line for the quarantine sink
    assert any("broken" in r["_corrupt_record"] for r in rejects.collect())
    df.unpersist()


def test_clustered_parquet_layout_and_stats(spark, sf_dir, tmp_path):
    """write_clustered_parquet: partition dirs by event_type, rows inside
    each file sorted by user_id (tight row-group min/max for stats
    pruning), content round-trips exactly."""
    import glob

    import pyarrow.parquet as pq

    from esther_apache_spark_spark.sources.sinks import write_clustered_parquet

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "clustered")
    write_clustered_parquet(events, out, "event_type", "user_id")

    parts = sorted(glob.glob(out + "/event_type=*"))
    assert len(parts) >= 2, "no value-partitioned layout"

    files = glob.glob(parts[0] + "/*.parquet")
    assert files
    col = pq.read_table(files[0], columns=["user_id"])["user_id"].to_pylist()
    assert col == sorted(col), "rows not clustered on user_id within file"

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert back.select(F.sum("value")).collect()[0][0] is not None


def test_text_sink_roundtrip(spark, tmp_path):
    """K5/S3: write_text part-files round-trip through read_text."""
    from esther_apache_spark_spark.sources.readers import read_text
    from esther_apache_spark_spark.sources.sinks import write_text

    lines = ["alpha", "bravo charlie", "delta"]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    out = str(tmp_path / "txt")
    write_text(df, out)
    back = read_text(spark, out)
    assert sorted(r["value"] for r in back.collect()) == sorted(lines)


def test_range_partitioned_layout_disjoint_stats(spark, sf_dir, tmp_path):
    """write_range_partitioned_parquet: per-file [min,max] intervals on
    the order key must be pairwise disjoint (that's the pruning
    guarantee), and the rows must round-trip completely."""
    import glob

    import pyarrow.parquet as pq

    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.sources.sinks import write_range_partitioned_parquet

    orders = load_table(spark, sf_dir, "orders")
    n_in = orders.count()
    out = str(tmp_path / "ranged")
    write_range_partitioned_parquet(orders, out, "o_custkey", 4)

    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index("o_custkey")
        lo = min(pf.metadata.row_group(i).column(idx).statistics.min
                 for i in range(pf.metadata.num_row_groups))
        hi = max(pf.metadata.row_group(i).column(idx).statistics.max
                 for i in range(pf.metadata.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) >= 2, "range write produced a single file; no pruning to test"
    spans.sort()
    for (_, prev_hi), (nxt_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= nxt_lo, f"overlapping file ranges: {spans}"

    assert spark.read.parquet(out).count() == n_in


def test_merge_schema_read_evolved_parquet(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema=true reads the union schema with nulls filled
    for the older files (the corpus-refresh pattern where new crawls
    gain metadata columns)."""
    from pyspark.sql import functions as F

    old = spark.range(3).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    new = spark.range(3, 6).select(
        F.col("id").alias("doc_id"),
        F.lit("fr").alias("lang"),
        F.lit(0.9).alias("quality"),
    )
    old.write.parquet(str(tmp_path / "corpus" / "batch=1"))
    new.write.parquet(str(tmp_path / "corpus" / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "corpus"))
    # union schema + the discovered `batch` partition column
    assert set(merged.columns) == {"doc_id", "lang", "quality", "batch"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[0]["quality"] is None and rows[4]["quality"] == 0.9
    assert merged.count() == 6


def test_observed_metrics_match_direct_aggregates(spark, sf_dir, tmp_path):
    """with_metrics: values computed in the SAME pass as the sink write
    must equal a direct aggregate over the same frame — and the
    instrumented write must not change the written data."""
    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators.observe import with_metrics
    from esther_apache_spark_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 1000)
    out, obs = with_metrics(
        orders,
        n=F.count(F.lit(1)),
        total_cents=F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
    )
    path = str(tmp_path / "observed")
    out.write.parquet(path)

    direct = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
    ).collect()[0]
    got = obs.get
    assert got["n"] == direct["n"] and got["total_cents"] == direct["total_cents"]
    assert spark.read.parquet(path).count() == direct["n"]


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    """compact_parquet: a fragmented 16-file dataset becomes 2 files
    with identical content; ordered mode also yields disjoint spans."""
    import glob

    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.sources.sinks import compact_parquet

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "frag")
    orders.repartition(16).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 16
    before = {tuple(r) for r in spark.read.parquet(path).collect()}

    compact_parquet(spark, path, 2)
    assert len(glob.glob(f"{path}/*.parquet")) == 2
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_compact_parquet_can_grow_file_count_and_cleans_up(spark, sf_dir, tmp_path):
    """target_files ABOVE the current partition count must be honored
    (coalesce cannot grow — the repartition path takes over), and the
    rename-aside swap must leave no .compact/.old residue on success."""
    import glob
    import os

    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.sources.sinks import compact_parquet

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "grow")
    nation.coalesce(1).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    before = {tuple(r) for r in spark.read.parquet(path).collect()}

    compact_parquet(spark, path, 4)
    assert len(glob.glob(f"{path}/*.parquet")) == 4
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before
    assert not os.path.exists(path + ".compact")
    assert not os.path.exists(path + ".old")


def test_zorder_layout_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order layout must make per-file min/max stats tight on BOTH
    z-order columns simultaneously — the property stats pruning needs.
    Quantified as the mean per-file span fraction of the global range:
    a naive (arrival-order) layout spans ~100% of both columns in every
    file; a single-key range layout is tight on its key only; z-order
    is materially tight on both."""
    import glob

    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.sources.sinks import (
        write_range_partitioned_parquet,
        write_zorder_parquet,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 8

    def mean_span(path, col):
        spans = []
        glo = hi = None
        per_file = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            r = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).first()
            per_file.append((r["lo"], r["hi"]))
        glo = min(lo for lo, _ in per_file)
        ghi = max(hi for _, hi in per_file)
        width = (ghi - glo) or 1
        return sum((hi - lo) / width for lo, hi in per_file) / len(per_file)

    zpath = str(tmp_path / "zorder")
    write_zorder_parquet(li, zpath, ["l_partkey", "l_suppkey"], n_files)
    rpath = str(tmp_path / "range")
    write_range_partitioned_parquet(li, rpath, "l_partkey", n_files)
    npath = str(tmp_path / "naive")
    li.repartition(n_files).write.parquet(npath)

    # content preserved
    assert spark.read.parquet(zpath).count() == li.count()

    z_part, z_supp = mean_span(zpath, "l_partkey"), mean_span(zpath, "l_suppkey")
    r_part, r_supp = mean_span(rpath, "l_partkey"), mean_span(rpath, "l_suppkey")
    n_part, n_supp = mean_span(npath, "l_partkey"), mean_span(npath, "l_suppkey")

    # naive layout: every file spans (almost) everything on both axes
    assert n_part > 0.9 and n_supp > 0.9, (n_part, n_supp)
    # range layout: disjoint on its key, blind on the other
    assert r_part < 0.3, r_part
    assert r_supp > 0.9, r_supp
    # z-order: materially tight on BOTH axes at once (8 files / 2 dims
    # -> ~sqrt(8)=2.8 cells per axis -> ~0.35 expected span fraction)
    assert z_part < 0.6 and z_supp < 0.6, (z_part, z_supp)
    assert z_part < n_part / 1.5 and z_supp < n_supp / 1.5


def test_write_sized_shards_deterministic_and_bounded(spark, sf_dir, tmp_path):
    """Sized-shard export: every file row-capped, full dataset
    round-trips, positions are a 0..N-1 permutation, and the assignment
    is identical across runs (fixed salt)."""
    import glob

    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.sources.sinks import write_sized_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n = docs.count()
    out = str(tmp_path / "shards")
    write_sized_shards(docs, out, "doc_id", records_per_file=64)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= -(-n // 64)  # at least ceil(N/64) files
    back = spark.read.parquet(out)
    assert back.count() == n
    positions = sorted(r["position"] for r in back.select("position").collect())
    assert positions == list(range(n))  # dense permutation survived
    # per-file cap honored
    for f in files:
        assert spark.read.parquet(f).count() <= 64, f
    # reproducible: same salt → same (doc_id, position) mapping
    out2 = str(tmp_path / "shards2")
    write_sized_shards(docs, out2, "doc_id", records_per_file=64)
    a = sorted(map(tuple, spark.read.parquet(out).select("doc_id", "position").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).select("doc_id", "position").collect()))
    assert a == b


def test_zorder_code_never_negative_with_many_columns(spark, tmp_path):
    """4+ z-order columns at the default 16 bits would shift into the
    sign bit (inverting the range layout for half the key space);
    zorder_value must clamp per-column resolution so the code stays
    non-negative and shift counts never wrap mod 64."""
    from esther_apache_spark_spark.sources.sinks import zorder_value

    df = spark.createDataFrame(
        [(i, i * 2, i * 3, 255 - i) for i in range(256)],
        "a long, b long, c long, d long",
    )
    z = zorder_value(
        [F.col(c) for c in "abcd"], [0.0] * 4, [765.0] * 4, bits=16
    )
    rows = df.select(z.alias("z")).collect()
    assert all(r["z"] >= 0 for r in rows)
    # max row must still map to the largest code (order preserved at
    # the extremes even after the resolution clamp)
    top = df.select(z.alias("z")).agg(F.max("z")).first()[0]
    assert rows[-1]["z"] == top


def test_binary_file_source_reads_blobs(spark, tmp_path):
    """binaryFile ingestion: one row per file, exact bytes, glob
    filtering, and the max_bytes guard failing fast instead of OOMing."""
    import pytest

    from esther_apache_spark_spark.sources.readers import read_binary_files

    blobs = {"a.bin": b"\x00\x01\x02mixed", "b.bin": b"B" * 1024, "skip.txt": b"x"}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert got == {"a.bin": blobs["a.bin"], "b.bin": blobs["b.bin"]}
    lens = {r["path"].rsplit("/", 1)[-1]: r["length"] for r in df.collect()}
    assert lens == {"a.bin": 8, "b.bin": 1024}

    guarded = read_binary_files(spark, str(tmp_path), glob="*.bin", max_bytes=100)
    # the SOURCE-level maxLength conf errors from file status before any
    # content byte is allocated (ADVICE r06); Spark's own error fires
    # first, the repo's raise_error layer stays as the in-plan backstop
    with pytest.raises(Exception, match="(?i)max_bytes|maxlength|exceeds"):
        guarded.collect()
    ok = read_binary_files(spark, str(tmp_path), glob="a.bin", max_bytes=100)
    assert ok.count() == 1
    # ADVICE r7: an unguarded call LEAVES the conf alone — the earlier
    # guarded DataFrame keeps its allocation-level layer even when a
    # guard-less read happens in between and evaluates after it
    unguarded = read_binary_files(spark, str(tmp_path), glob="b.bin")
    with pytest.raises(Exception, match="(?i)max_bytes|maxlength|exceeds"):
        unguarded.collect()
    with pytest.raises(Exception, match="(?i)max_bytes|maxlength|exceeds"):
        guarded.collect()
    # a LATER guarded call with a wider bound is the documented
    # last-call-wins path for raising the allocation-level limit
    wider = read_binary_files(spark, str(tmp_path), glob="b.bin", max_bytes=4096)
    assert wider.count() == 1
    spark.conf.unset("spark.sql.sources.binaryFile.maxLength")


def test_sqlite_upsert_batch_exactly_once(tmp_path):
    """The ledger contract: re-applying a batch_id is a no-op, upserts
    are keyed, and data + ledger commit atomically."""
    import sqlite3

    from esther_apache_spark_spark.sources.sinks import sqlite_upsert_batch

    db = str(tmp_path / "state.db")
    cols = ["user_id", "total"]
    assert sqlite_upsert_batch(db, "t", ["user_id"], cols, [(1, 10), (2, 5)], 0)
    # replay of batch 0 with DIFFERENT (stale) data must be ignored
    assert not sqlite_upsert_batch(db, "t", ["user_id"], cols, [(1, 999)], 0)
    # batch 1 updates key 1, inserts key 3
    assert sqlite_upsert_batch(db, "t", ["user_id"], cols, [(1, 20), (3, 7)], 1)
    con = sqlite3.connect(db)
    got = sorted(con.execute("SELECT user_id, total FROM t").fetchall())
    ledger = sorted(
        con.execute("SELECT batch_id FROM _applied_batches WHERE table_name='t'")
    )
    con.close()
    assert got == [(1, 20), (2, 5), (3, 7)]
    assert [b for (b,) in ledger] == [0, 1]


def test_stream_upsert_sqlite_matches_batch_totals(spark, sf_dir, tmp_path):
    """End-to-end: stream the events table through an update-mode keyed
    aggregation into the exactly-once SQLite sink; the final table must
    equal the batch groupBy, and a forced duplicate redelivery of the
    last batch must change nothing."""
    import sqlite3

    from esther_apache_spark_spark.sources.sinks import (
        sqlite_upsert_batch,
        stream_upsert_sqlite,
    )
    from esther_apache_spark_spark.streaming.events import streaming_events_source

    db = str(tmp_path / "totals.db")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming_events_source(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.sum((F.col("value").cast("decimal(12,2)") * 100).cast("long")).alias(
            "cents"
        )
    )
    q = stream_upsert_sqlite(agg, db, "user_totals", ["user_id"], ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {
        r["user_id"]: r["cents"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100).cast("long")
            ).alias("cents")
        )
        .collect()
    }
    con = sqlite3.connect(db)
    got = dict(con.execute("SELECT user_id, cents FROM user_totals").fetchall())
    applied = [
        b
        for (b,) in con.execute(
            "SELECT batch_id FROM _applied_batches WHERE table_name='user_totals'"
        )
    ]
    con.close()
    assert got == want
    # redeliver the last applied batch with corrupt data: must no-op
    assert not sqlite_upsert_batch(
        db, "user_totals", ["user_id"], ["user_id", "cents"],
        [(min(want), -1)], max(applied),
    )
    con = sqlite3.connect(db)
    still = dict(con.execute("SELECT user_id, cents FROM user_totals").fetchall())
    con.close()
    assert still == want
