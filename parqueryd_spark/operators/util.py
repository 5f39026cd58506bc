"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives in
    few splits (one small parquet file = one partition = one core doing all of
    a compute-heavy operator's work). The shuffle is cheap next to the compute;
    at real scale the input already has enough splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
