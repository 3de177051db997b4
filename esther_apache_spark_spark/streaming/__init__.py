"""Structured Streaming extension (SURVEY.md §2.12/§7 M5 — no reference
citation by construction: the reference has no streaming surface)."""

from esther_apache_spark_spark.streaming.events import (
    interval_join_views_purchases,
    run_stream_dedup,
    run_streaming_interval_join,
    run_streaming_tumbling_agg,
    running_user_totals_stream,
    sessionize_batch,
    stream_to_partitioned_parquet,
    streaming_events_source,
    tumbling_agg,
)

__all__ = [
    "streaming_events_source",
    "tumbling_agg",
    "run_streaming_tumbling_agg",
    "sessionize_batch",
    "run_stream_dedup",
    "interval_join_views_purchases",
    "run_streaming_interval_join",
    "running_user_totals_stream",
    "stream_to_partitioned_parquet",
]
