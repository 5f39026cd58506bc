from parqueryd_spark.sources.parquet import load_table, read_parquet, resolve_paths

__all__ = ["load_table", "read_parquet", "resolve_paths"]
