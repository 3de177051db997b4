"""Incremental partition processing: only unseen partitions are handled,
the manifest survives reruns, and a crashed run (no manifest update)
re-processes idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from esther_apache_spark_spark.schemas import load_table
from esther_apache_spark_spark.sources.incremental import (
    list_partition_values,
    load_manifest,
    process_new_partitions,
)


def _write_day(events, root, day):
    (
        events.filter(F.date_format("ts", "yyyy-MM-dd") == day)
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("append")
        .partitionBy("dt")
        .parquet(root)
    )


def test_incremental_processing(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    days = [
        r["d"]
        for r in events.select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .orderBy("d")
        .limit(3)
        .collect()
    ]
    assert len(days) >= 2

    root = str(tmp_path / "in")
    manifest = str(tmp_path / "state" / "manifest.json")
    out = str(tmp_path / "out")

    processed_log = []

    def summarize(df, day):
        processed_log.append(day)
        (
            df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(f"{out}/dt={day}")  # idempotent per-partition sink
        )

    # day 1 arrives
    _write_day(events, root, days[0])
    got = process_new_partitions(spark, root, manifest, summarize, key="dt")
    assert got == [days[0]]
    assert load_manifest(manifest) == {days[0]}

    # caught up: nothing to do
    assert process_new_partitions(spark, root, manifest, summarize, key="dt") == []

    # two more days land; only they are processed
    _write_day(events, root, days[1])
    _write_day(events, root, days[2])
    got = process_new_partitions(spark, root, manifest, summarize, key="dt")
    assert got == sorted(days[1:3])
    assert processed_log == [days[0]] + sorted(days[1:3])

    # outputs exist per partition and carry the per-day counts
    for day in days[:3]:
        back = spark.read.parquet(f"{out}/dt={day}")
        assert back.agg(F.sum("n")).first()[0] > 0
    assert sorted(list_partition_values(root, "dt")) == sorted(days[:3])
