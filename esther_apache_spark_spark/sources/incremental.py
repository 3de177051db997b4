"""Incremental partition processing — the reference's daily cadence,
scale-correctly.

The reference pipeline reprocesses all 31 daily files on every run
(``pipeline_pyspark.py:74-76`` re-globs ``orders_*.json`` each time).
At 100 TB a run must touch only partitions it has not seen: this module
tracks processed partition values in a manifest file and hands each new
partition's pruned scan to a caller-supplied function.

Semantics:
- Discovery is a driver-side directory listing of ``key=value`` dirs —
  O(number of partitions), not O(data); fine for date-grained layouts.
- The manifest is written AFTER the batch of new partitions succeeds
  (write-temp + atomic rename), so a crashed run re-processes the same
  partitions next time. Exactly-once therefore requires the per-partition
  work to be idempotent — e.g. `mode("overwrite")` into a per-partition
  output path, the same contract Structured Streaming's foreachBatch
  asks of its writer.
- Each partition is read through ``root/key=value`` so the scan is
  partition-pruned by construction.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def list_partition_values(root: str, key: str = "date") -> list[str]:
    """Partition values present in a ``key=value``-laid-out directory."""
    prefix = f"{key}="
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return []
    return sorted(n[len(prefix):] for n in names if n.startswith(prefix))


def load_manifest(path: str) -> set[str]:
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return set(json.load(f))


def _save_manifest(path: str, values: set[str]) -> None:
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(sorted(values), f)
    os.replace(tmp, path)  # atomic on POSIX


def process_new_partitions(
    spark: SparkSession,
    root: str,
    manifest_path: str,
    fn: Callable[[DataFrame, str], None],
    key: str = "date",
) -> list[str]:
    """Run ``fn(partition_df, value)`` for every partition not yet in the
    manifest, oldest first; record them on success. Returns the values
    processed this run (empty when caught up)."""
    done = load_manifest(manifest_path)
    todo = [v for v in list_partition_values(root, key) if v not in done]
    for v in todo:
        fn(spark.read.parquet(f"{root}/{key}={v}"), v)
    if todo:
        _save_manifest(manifest_path, done | set(todo))
    return todo
