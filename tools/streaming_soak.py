#!/usr/bin/env python
"""Streaming throughput soak (r8, VERDICT r7 #7).

The stateful streaming family is EQUALITY-tested against batch twins on
file streams (correctness); this tool prices its THROUGHPUT: sf0.1-scale
events replay through (a) the tumbling windowed aggregation and (b) the
``applyInPandasWithState`` daily-anomaly fold, driven by the ``rate``
source at an intentionally unreachable rowsPerSecond so the ENGINE — not
the source schedule — is the bottleneck. Each rate row joins (stream ⋈
static, broadcast-sized static side) to one real event row by index, so
the streamed rows carry genuine timestamps/types/values, then flows
through the same operators the catalog entries use.

Reported metric per pipeline: rows/sec = rows actually absorbed / wall
seconds from query start until cumulative input reaches n_events (the
flooding source packs millions of rows into the first micro-batches, so
the divisor is the REAL processed count from ``recentProgress``, and
the wall clock includes micro-batch scheduling overhead — which IS part
of streaming throughput). One JSON line on stdout; progress on stderr.
BASELINE.md records the readings.

Usage: python tools/streaming_soak.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

RATE_ROWS_PER_SEC = 5_000_000  # far above achievable => engine-bound
TIMEOUT_SEC = 600


def _drain(q, n_target: int) -> tuple[int, float]:
    """Run the started query until cumulative input rows ≥ n_target;
    return (rows actually processed, elapsed wall seconds from
    start()). The rate source floods far past n_target within single
    micro-batches — throughput must divide by the rows the engine
    really absorbed, not the target. Raises on timeout."""
    t0 = time.time()
    seen = 0
    while True:
        seen = sum(p["numInputRows"] for p in q.recentProgress)
        if seen >= n_target:
            break
        if time.time() - t0 > TIMEOUT_SEC:
            raise TimeoutError(f"soak stalled at {seen}/{n_target} rows")
        time.sleep(0.5)
    return seen, time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.session import get_spark
    from esther_apache_spark_spark.streaming.events import (
        daily_anomaly_updates,
        tumbling_agg,
    )

    spark = get_spark("streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    # Static replay side: one row per index; localCheckpoint so the
    # stream-static join re-reads materialized blocks, not the plan.
    from pyspark.sql import Window

    indexed = ev.withColumn(
        "idx", F.row_number().over(Window.orderBy("event_id")) - 1
    ).localCheckpoint()
    n = indexed.count()
    print(f"[soak] {n} events from {sf_dir}", file=sys.stderr, flush=True)

    def rate_events():
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", RATE_ROWS_PER_SEC)
            .option("numPartitions", "8")
            .load()
        )
        # modulo keeps the stream joining (and the state machinery hot)
        # even past one full pass; _drain stops at exactly n input rows
        return rate.select((F.col("value") % n).alias("idx")).join(
            F.broadcast(indexed), "idx"
        )

    results: dict[str, float] = {}

    # (a) windowed aggregation (same operator as tumbling_window_agg)
    q = (
        tumbling_agg(rate_events())
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("soak_window")
        .start()
    )
    try:
        seen, elapsed = _drain(q, n)
    finally:
        q.stop()
    results["tumbling_window_rows_per_sec"] = round(seen / elapsed, 1)
    results["tumbling_window_rows"] = seen
    print(
        f"[soak] tumbling window: {seen} rows in {elapsed:.2f}s "
        f"= {results['tumbling_window_rows_per_sec']:.0f} rows/s",
        file=sys.stderr,
        flush=True,
    )

    # (b) stateful daily-anomaly fold (applyInPandasWithState)
    q = (
        daily_anomaly_updates(rate_events())
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("soak_anomaly")
        .start()
    )
    try:
        seen, elapsed = _drain(q, n)
    finally:
        q.stop()
    results["anomaly_state_fold_rows_per_sec"] = round(seen / elapsed, 1)
    results["anomaly_state_fold_rows"] = seen
    print(
        f"[soak] anomaly state fold: {seen} rows in {elapsed:.2f}s "
        f"= {results['anomaly_state_fold_rows_per_sec']:.0f} rows/s",
        file=sys.stderr,
        flush=True,
    )

    out = {
        "metric": "streaming_soak_rows_per_sec",
        "sf_dir": sf_dir,
        "n_events": n,
        "rate_rows_per_sec_configured": RATE_ROWS_PER_SEC,
        **results,
    }
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
