"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API).

Engine extension — the reference reads only files and JDBC
(``pipeline_pyspark.py:94-98``); a 100-TB platform also ingests from
in-house feeds with no builtin connector. PySpark 4's Python data
source API is the sanctioned way to write one (batch reads are
partitioned executor-side — the driver never materializes rows), and
this module exercises it end to end with a DETERMINISTIC synthetic
events feed:

- batch: ``spark.read.format("synthetic_events")`` with ``rows``,
  ``partitions``, ``seed`` options; each input partition seeds its own
  generator (seed + partition id), so reads are reproducible and
  executor-parallel — the same recipe an internal-feed connector uses
  for split-level parallelism.
- streaming: ``spark.readStream.format("synthetic_events")`` via
  ``SimpleDataSourceStreamReader`` — offsets are row counters, each
  microbatch deterministically re-derivable from its offset range
  (exactly the replayability contract Structured Streaming requires of
  a source for failure recovery).

The generated schema mirrors the testdata ``events`` table so every
downstream operator (windows, sessionization, streaming aggs) composes
unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_TYPES = ("view", "click", "purchase", "signup", "error")


def _row(i: int, seed: int):
    """Deterministic event #i — pure function of (seed, i), so batch
    partitions and stream offset ranges replay identically."""
    import datetime
    import hashlib

    h = int.from_bytes(
        hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big"
    )
    ts = datetime.datetime(2025, 1, 1) + datetime.timedelta(seconds=i)
    return (
        i,
        ts,
        h % 1000,
        _TYPES[(h >> 10) % len(_TYPES)],
        round((h >> 13) % 10_000 / 100.0, 2),
        '{"k": %d}' % ((h >> 27) % 100),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, -(-self.rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Row-counter offsets; every microbatch emits ``batch_rows`` new
    events. ``readBetweenOffsets`` re-derives any past range from the
    offsets alone — the replay contract that makes recovery exact."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 10))
        self.seed = int(options.get("seed", 42))
        # 0 = unbounded (a real feed); tests set a cap so
        # processAllAvailable() terminates.
        self.max_rows = int(options.get("max_rows", 0))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        hi = lo + self.batch_rows
        if self.max_rows:
            hi = min(hi, self.max_rows)
        return (
            iter([_row(i, self.seed) for i in range(lo, hi)]),
            {"offset": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_row(i, self.seed) for i in range(start["offset"], end["offset"])]
        )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _SyntheticStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration; after this,
    ``spark.read.format("synthetic_events")`` works."""
    spark.dataSource.register(SyntheticEventsDataSource)
