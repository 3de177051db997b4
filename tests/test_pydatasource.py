"""Custom Python DataSource: partitioned deterministic batch reads and
a replayable microbatch stream (PySpark 4 datasource API)."""

from __future__ import annotations

from pyspark.sql import functions as F

from esther_apache_spark_spark.sources.pydatasource import (
    register_synthetic_source,
)


def _read(spark, **opts):
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_batch_read_partitioned_and_deterministic(spark):
    register_synthetic_source(spark)
    df = _read(spark, rows=500, partitions=8, seed=7)
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    # pure function of (seed, i): two reads are identical
    a = sorted(df.collect())
    b = sorted(_read(spark, rows=500, partitions=3, seed=7).collect())
    assert a == b
    # a different seed diverges
    c = sorted(_read(spark, rows=500, partitions=8, seed=8).collect())
    assert a != c
    # schema mirrors the events table -> downstream ops compose
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert agg.count() == 5
    assert sum(r["n"] for r in agg.collect()) == 500


def test_stream_read_replayable_microbatches(spark, tmp_path):
    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("batch_rows", 25)
        .option("max_rows", 75)
        .option("seed", 7)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from synth_stream")
        n = got.count()
        assert n == 75
        # the stream's rows equal the batch source's first n rows —
        # offset ranges replay the same pure generator
        batch = _read(spark, rows=n, partitions=4, seed=7)
        assert sorted(got.collect()) == sorted(batch.collect())
    finally:
        q.stop()


def test_stream_composes_with_windowed_agg(spark, tmp_path):
    """The custom source feeds the engine's real streaming operators:
    a watermarked tumbling-window aggregate over the streamed rows must
    equal the same aggregate applied in batch to the same generator
    output (schema parity + replayable offsets make this exact)."""
    from esther_apache_spark_spark.streaming.events import tumbling_agg

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("batch_rows", 40)
        .option("max_rows", 120)
        .option("seed", 11)
        .load()
    )
    q = (
        tumbling_agg(stream, window="1 minute", watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("synth_windowed")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("select * from synth_windowed").collect()
        }
    finally:
        q.stop()
    batch = _read(spark, rows=120, partitions=4, seed=11)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_agg(batch, window="1 minute").collect()
    }
    assert got == want
