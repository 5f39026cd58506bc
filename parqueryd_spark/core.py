"""The parqueryd-parity query surface, Spark-first.

The reference's flagship call is
``rpc.groupby(filenames, groupby_cols, agg_list, where_terms, aggregate=)``
(reference: parqueryd/rpc.py:121-190, controller.py:599-646, worker.py:367-408).
Its distributed execution — per-file fan-out, locality scheduling, Arrow
gather/concat — is subsumed by Spark; what remains is a compiler from that call
shape to a DataFrame plan:

    read.parquet(existing_shards) -> filter(where) -> groupBy(keys).agg(...)

Deliberate semantic deviation (documented, SURVEY.md §2 O7): the reference
concatenates per-shard partial aggregates WITHOUT a final merge, so duplicate
group keys can reach the client and per-shard ``mean`` is unmergeable. Spark's
partial+final aggregation gives the correct global answer; the reference's own
single-file differential test (tests/test_simple_rpc.py:112-131) is the semantic
oracle we match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from parqueryd_spark.functions.compile import (
    compile_agg_list,
    compile_where_terms,
    normalize_agg_list,
)
from parqueryd_spark.sources.parquet import read_parquet


def aggregate_files(
    spark: SparkSession,
    paths: Sequence[str] | str,
    groupby_cols: Sequence[str],
    agg_list: Sequence,
    where_terms: Sequence[Sequence] | None = None,
    aggregate: bool = True,
    data_dir: str | None = None,
) -> DataFrame | None:
    """Run the reference's ``groupby`` call shape over parquet shards.

    Parameters mirror the 4-arg RPC (controller.py:608-615) plus the
    ``aggregate`` kwarg (worker.py:385):

    - ``aggregate=True``: global filter -> groupBy -> agg.
    - ``aggregate=False``: filtered, projected raw rows (no aggregation) — the
      projection is groupby cols + agg input cols, the column set the reference
      materializes (worker.py:382-384).

    Missing shards are silently ignored; if none exist, returns ``None``
    (reference empty-result protocol — callers may prefer
    :meth:`ParquetEngine.groupby`, which returns an empty DataFrame instead).
    """
    df = read_parquet(spark, paths, data_dir=data_dir)
    if df is None:
        return None
    pred = compile_where_terms(where_terms)
    if pred is not None:
        df = df.filter(pred)
    triples = normalize_agg_list(agg_list)
    if not aggregate:
        proj: list[str] = []
        for c in list(groupby_cols) + [t[0] for t in triples]:
            if c not in proj:
                proj.append(c)
        return df.select(*proj)
    aggs = compile_agg_list(agg_list)
    if groupby_cols:
        return df.groupBy(*groupby_cols).agg(*aggs)
    return df.agg(*aggs)


class ParquetEngine:
    """Client-facing facade with the reference RPC's surface.

    ``ParquetEngine(spark, data_dir).groupby([...], ...)`` is the drop-in for
    ``parqueryd.rpc.RPC(...).groupby(...)``: bare filenames resolve against
    ``data_dir`` (worker.py:388), missing shards are ignored, and an all-missing
    query returns an empty (0-row, 0-column) DataFrame rather than the
    reference's ``None`` (documented superset; rpc.py:151-153).
    """

    def __init__(self, spark: SparkSession, data_dir: str | None = None):
        self.spark = spark
        self.data_dir = data_dir

    def groupby(
        self,
        filenames: Sequence[str] | str,
        groupby_cols: Sequence[str],
        agg_list: Sequence,
        where_terms: Sequence[Sequence] | None = None,
        aggregate: bool = True,
    ) -> DataFrame:
        result = aggregate_files(
            self.spark,
            filenames,
            groupby_cols,
            agg_list,
            where_terms=where_terms,
            aggregate=aggregate,
            data_dir=self.data_dir,
        )
        if result is None:
            return self.spark.createDataFrame([], schema="struct<>")
        return result

    # --- service-surface analogs (SURVEY.md §2.3) ---

    def ping(self) -> str:
        """Liveness (controller.py:496-497)."""
        return "pong"

    def info(self) -> dict:
        """Cluster topology snapshot (controller.py:683-701 analog)."""
        sc = self.spark.sparkContext
        return {
            "app_name": sc.appName,
            "app_id": sc.applicationId,
            "master": sc.master,
            "default_parallelism": sc.defaultParallelism,
            "spark_version": self.spark.version,
            "data_dir": self.data_dir,
        }

    def loglevel(self, level: str) -> None:
        """Propagate log level (controller.py:498-510 analog)."""
        self.spark.sparkContext.setLogLevel(level)
