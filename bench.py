#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query runs a warmup pass at sf0.001 (amortizes session and codegen
startup out of the numbers), then $SPARK_GRAFT_BENCH_RUNS (default 3)
timed passes of the full plan (count() forces execution without
collecting results to the driver); the reported figure is the per-query
MEDIAN — single-run numbers jitter 10-40% under machine load, which is
indistinguishable from a real plan regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_daily_segment_sales",
    "multikey_agg",
    "preagg_left_join",
    "topk_customers_by_revenue",
    "dedup_keep_first",
    "word_count",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "text_stats",
    "asof_join_purchases",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "semi_join_orders_with_returns",
    "anti_join_customers_no_orders",
    "freshkart_daily_city_sales",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from esther_apache_spark_spark import plans
    from esther_apache_spark_spark.session import get_spark

    spark = get_spark("esther-bench")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = plans.QUERIES[name]
        spec.fn(spark, warm_dir).count()  # warmup: codegen + classloading
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
