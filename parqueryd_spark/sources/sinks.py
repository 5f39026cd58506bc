"""Sinks — the reference's result-egress surface, Spark-first.

The reference ships results as Arrow IPC bytes to the client (worker.py:400-403,
O10) and creates data with ``parquery.write.df_to_parquet`` (O11, README.md:25-28).
Spark equivalents: ``to_pandas_result`` (Arrow-backed collect at the client
edge, with the empty-result protocol) and ``write_parquet`` (distributed writer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def to_pandas_result(df: DataFrame | None, none_on_empty: bool = False) -> pd.DataFrame | None:
    """Client-edge materialization (Arrow-backed toPandas).

    ``none_on_empty=True`` reproduces the reference's empty-result protocol —
    a 0-row result arrives as ``None`` at the client (rpc.py:151-153) — for
    drop-in parity; default is the saner empty-DataFrame superset.
    """
    if df is None:
        return None
    pdf = df.toPandas()
    if none_on_empty and len(pdf) == 0:
        return None
    return pdf


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Distributed parquet writer (df_to_parquet analog). ``partition_by``
    produces hive-style directory partitioning — the 100 TB replacement for the
    reference's manual shard files; ``max_records_per_file`` bounds file sizes
    for downstream scan parallelism."""
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
