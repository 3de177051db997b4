"""Sources (scans) and sinks — SURVEY.md §2.1 / §2.2, full surface."""

from esther_apache_spark_spark.sources.readers import (
    from_rows,
    read_csv,
    read_jdbc,
    read_json_lines,
    read_json_lines_with_rejects,
    read_json_multiline,
    read_orc,
    read_parquet,
    read_text,
)
from esther_apache_spark_spark.sources.sinks import (
    quarantine_split,
    write_bucketed_table,
    write_clustered_parquet,
    write_csv_dialect,
    write_jdbc,
    write_json_lines,
    write_orc,
    write_partitioned_parquet,
    write_sqlite,
    write_text,
)

__all__ = [
    "read_json_multiline",
    "read_csv",
    "read_text",
    "read_parquet",
    "read_orc",
    "read_json_lines",
    "read_json_lines_with_rejects",
    "read_jdbc",
    "from_rows",
    "write_csv_dialect",
    "write_partitioned_parquet",
    "write_clustered_parquet",
    "write_bucketed_table",
    "write_sqlite",
    "write_jdbc",
    "write_text",
    "write_orc",
    "write_json_lines",
    "quarantine_split",
]
