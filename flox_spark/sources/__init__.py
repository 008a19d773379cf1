from flox_spark.sources.io import (
    compact_files,
    load_table,
    read_csv,
    read_json,
    read_parquet,
    read_stream_table,
    write_bucketed_table,
    write_partitioned,
    write_table,
)

__all__ = [
    "compact_files",
    "load_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_stream_table",
    "write_bucketed_table",
    "write_partitioned",
    "write_table",
]
