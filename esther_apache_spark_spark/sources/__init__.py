"""Sources (scans) and sinks — SURVEY.md §2.1 / §2.2."""

from esther_apache_spark_spark.sources.readers import (
    from_rows,
    read_csv,
    read_json_multiline,
    read_parquet,
    read_text,
)
from esther_apache_spark_spark.sources.sinks import (
    quarantine_split,
    write_csv_dialect,
    write_partitioned_parquet,
    write_sqlite,
    write_text,
)

__all__ = [
    "read_json_multiline",
    "read_csv",
    "read_text",
    "read_parquet",
    "from_rows",
    "write_csv_dialect",
    "write_partitioned_parquet",
    "write_sqlite",
    "write_text",
    "quarantine_split",
]
