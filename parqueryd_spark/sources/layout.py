"""Data layout: hive-partitioned writes, range-sorted files, atomic publish.

At 100 TB, layout IS performance: partition pruning turns full scans into
single-partition reads, and range-sorted files give parquet row-group min/max
stats real selectivity. ``publish_atomic`` is the Spark-era analog of the
reference's moveparquet barrier (worker.py:689-779): readers never observe a
half-written dataset because visibility flips with one directory rename.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: dict[str, Column | str],
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet, deriving partition columns on the fly
    (e.g. ``{"event_date": F.to_date("ts")}``). Queries filtering on the
    partition column scan only matching directories (PartitionFilters in the
    plan — asserted in tests/test_layout.py)."""
    out = df
    names = []
    for name, expr in partition_cols.items():
        out = out.withColumn(name, F.col(expr) if isinstance(expr, str) else expr)
        names.append(name)
    out.write.mode(mode).partitionBy(*names).parquet(path)


def optimize_layout(
    df: DataFrame, sort_cols: list[str], target_partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort-within-partitions on the hot filter columns so
    parquet row-group min/max statistics become selective (poor-man's
    clustering; the single-dimension case of Z-ordering)."""
    parts = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(parts, *sort_cols).sortWithinPartitions(*sort_cols)


def publish_atomic(df: DataFrame, final_path: str) -> None:
    """All-or-nothing dataset publish: write to a staging sibling, then swap
    directories. Readers see the old version until the rename, never a partial
    write — the moveparquet-barrier semantics (reference worker.py:729-779)
    without any coordination service. (On object stores use a format with a
    transaction log — Delta/Iceberg — instead of renames.)"""
    staging = final_path + ".staging"
    backup = final_path + ".old"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    if os.path.exists(final_path):
        os.rename(final_path, backup)
    os.rename(staging, final_path)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def cache_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Register + cache a parquet table (the thin analog of the reference's
    download-to-local-disk layer, O19 — Spark's cache replaces file copying)."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    spark.catalog.cacheTable(name)
    return spark.table(name)
