"""Scan operators S1-S6 (SURVEY.md §2.1), explicit-schema only.

The reference reads with inference (``pipeline_pyspark.py:94-98``); here
every reader takes a declared ``StructType`` — at 100 TB schema inference
is an extra full pass and nondeterministic. Multi-file JSON globs (S1's
31 daily ``orders_*.json``) become one distributed scan; Spark handles
the union natively (U1 subsumed at read time).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json_multiline(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    multiline: bool = True,
) -> DataFrame:
    """S1 — daily order JSON files (pretty-printed → multiLine).

    Reference: ``pipeline_pyspark.py:94-96`` (inference dropped by design).
    """
    reader = spark.read.schema(schema)
    if multiline:
        reader = reader.option("multiLine", "true")
    if isinstance(paths, str):
        paths = [paths]
    return reader.json(list(paths))


def read_csv(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """S2 — CSV with header (reference ``pipeline_pyspark.py:97-98``)."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
    )
    if isinstance(path, str):
        path = [path]
    return reader.csv(list(path))


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S3 — line-per-row text (reference ``tuto_dataframes_pyspark(2).ipynb:408``)."""
    return spark.read.text(path)


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S5 — parquet scan, the engine's primary columnar source."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def from_rows(
    spark: SparkSession, rows: Iterable, schema: StructType | list[str]
) -> DataFrame:
    """S4 — local collection → DataFrame (test fixtures;
    reference ``tuto_dataframes_pyspark(2).ipynb:117,171,215``)."""
    return spark.createDataFrame(list(rows), schema)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S6 — RDBMS source (reference bootstraps customers/refunds from a
    Postgres dump, ``freshkartmindump.sql:14-32``). Needs the JDBC driver
    jar on the classpath at session creation; round-tripped against an
    embedded DuckDB database in ``tests/test_jdbc.py`` (skips, with the
    reason stated, when no driver jar is discoverable).

    Without the partitioning arguments the read is ONE task on one
    executor — a driver-side bottleneck the moment the table is bigger
    than a dim. Pass ``partition_column`` (a roughly-uniform numeric/
    date key, e.g. the PK) with ``lower_bound``/``upper_bound``/
    ``num_partitions`` and Spark issues ``num_partitions`` concurrent
    range-predicate queries (WHERE col >= lo AND col < hi), one per
    task — the standard way to drain an RDBMS at cluster ingest speed
    without hand-sharding. Bounds only steer the stride; rows outside
    them still land in the first/last partition. All four must be given
    together (Spark's contract)."""
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions (Spark's jdbc partitioning contract)"
            )
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=properties or {},
        )
    return spark.read.jdbc(url, table, properties=properties or {})


def read_orc(
    spark: SparkSession, paths: str | Sequence[str], schema: StructType
) -> DataFrame:
    """ORC scan (columnar alternative to parquet — same pushdown/pruning
    behavior via Spark's vectorized ORC reader). Beyond the reference's
    format list; included so a user can point the engine at ORC lakes
    without conversion."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.schema(schema).orc(*paths)


def read_json_lines(
    spark: SparkSession, paths: str | Sequence[str], schema: StructType
) -> DataFrame:
    """Newline-delimited JSON scan (the splittable default; S1's
    ``multiLine`` variant exists only for pretty-printed files — at
    100 TB use JSONL so each file splits into many input partitions)."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.schema(schema).json(*paths)


def read_json_lines_with_rejects(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan with malformed-row capture (the read-time twin of
    the K4 quarantine split): PERMISSIVE mode parses what it can and
    lands each unparseable line, verbatim, in ``corrupt_col`` — so one
    scan yields both clean rows (``corrupt_col IS NULL``) and a reject
    side channel, instead of a 100 TB re-read in FAILFAST or silent
    loss in DROPMALFORMED. The corrupt column must be declared in the
    read schema (Spark ignores it otherwise) — this helper appends it."""
    from pyspark.sql.types import StringType, StructField

    if corrupt_col not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if isinstance(path, str):
        path = [path]
    return reader.json(list(path))


def read_binary_files(
    spark: SparkSession,
    path: str | Sequence[str],
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Opaque-blob ingestion via Spark's built-in ``binaryFile`` source —
    the front door of the multimodal pipeline (`operators/multimodal.py`
    decodes the blobs): one row per file with (path, modificationTime,
    length, content binary). The source is NOT splittable (a file is one
    row), so parallelism comes from file COUNT — shard media into many
    objects upstream, and keep `spark.sql.files.maxPartitionBytes` in
    mind only for batching small files together. ``glob`` maps to
    pathGlobFilter (server-side filename pruning).

    ``max_bytes`` guards the executor heap with TWO layers (ADVICE
    r06): (1) the session conf
    ``spark.sql.sources.binaryFile.maxLength`` is lowered to the bound,
    which makes the source itself error from the file STATUS — before
    any content byte is allocated — so a truly heap-breaking file can
    never OOM ahead of the check; (2) a ``raise_error`` projection on
    the length column keeps the repo-styled message (with the offending
    path) for rows that slip past a later conf change. The conf is
    session-scoped and read at SCAN time, so among GUARDED calls the
    most recently set bound wins for every binaryFile scan executed
    after it; a call WITHOUT ``max_bytes`` leaves the conf untouched
    (ADVICE r7 — unsetting here silently stripped the allocation-level
    guard from guarded DataFrames built earlier but evaluated later).
    The ``raise_error`` layer is what stays pinned to THIS DataFrame
    regardless, and its message names the last-call-wins hazard."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if isinstance(path, str):
        path = [path]
    _MAXLEN_CONF = "spark.sql.sources.binaryFile.maxLength"
    if max_bytes is not None:
        # fail-fast at the SOURCE: length check against file status,
        # before content materialization (the raise_error layer below
        # runs after the row exists and cannot guard the allocation).
        # Deliberately NEVER unset on guard-less calls: the conf is read
        # at scan time, so unsetting would strip layer 1 from guarded
        # DataFrames built earlier but evaluated later (ADVICE r7).
        spark.conf.set(_MAXLEN_CONF, int(max_bytes))
    df = reader.load(list(path))
    if max_bytes is not None:
        from pyspark.sql import functions as F

        oversize = F.col("length") > int(max_bytes)
        df = df.withColumn(
            "content",
            F.when(
                oversize,
                F.raise_error(
                    F.concat(
                        F.lit("binary file exceeds max_bytes: "),
                        F.col("path"),
                        F.lit(
                            " (post-materialization layer; the allocation"
                            "-level binaryFile.maxLength conf follows the"
                            " most recent guarded read_binary_files call)"
                        ),
                    )
                ).cast("binary"),
            ).otherwise(F.col("content")),
        )
    return df
