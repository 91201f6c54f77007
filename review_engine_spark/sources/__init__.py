"""Sources & sinks (SURVEY §2.A)."""

from review_engine_spark.sources.io import (
    read_jsonl,
    read_parquet_table,
    read_tables,
    write_jsonl_gz,
    write_parquet,
)

__all__ = [
    "read_jsonl",
    "read_parquet_table",
    "read_tables",
    "write_jsonl_gz",
    "write_parquet",
]
