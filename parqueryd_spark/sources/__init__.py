from parqueryd_spark.sources.parquet import load_table, read_parquet, resolve_paths
from parqueryd_spark.sources.sinks import to_pandas_result, write_parquet

__all__ = ["load_table", "read_parquet", "resolve_paths", "to_pandas_result", "write_parquet"]
