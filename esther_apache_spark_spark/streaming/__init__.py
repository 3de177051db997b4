"""Structured Streaming extension (SURVEY.md §2.12/§7 M5 — no reference
citation by construction: the reference has no streaming surface)."""

from esther_apache_spark_spark.streaming.events import (
    run_streaming_tumbling_agg,
    sessionize_batch,
    streaming_events_source,
    tumbling_agg,
)

__all__ = [
    "streaming_events_source",
    "tumbling_agg",
    "run_streaming_tumbling_agg",
    "sessionize_batch",
]
