from flox_spark.sources.io import load_table, read_parquet

__all__ = ["load_table", "read_parquet"]
