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
from parqueryd_spark.sources.parquet import read_parquet, resolve_paths


def aggregate_files(
    spark: SparkSession,
    paths: Sequence[str] | str,
    groupby_cols: Sequence[str],
    agg_list: Sequence,
    where_terms: Sequence[Sequence] | None = None,
    aggregate: bool = True,
    data_dir: str | None = None,
    shard_merge: str = "global",
) -> DataFrame | None:
    """Run the reference's ``groupby`` call shape over parquet shards.

    Parameters mirror the 4-arg RPC (controller.py:608-615) plus the
    ``aggregate`` kwarg (worker.py:385):

    - ``aggregate=True``: global filter -> groupBy -> agg.
    - ``aggregate=False``: filtered, projected raw rows (no aggregation) — the
      projection is groupby cols + agg input cols, the column set the reference
      materializes (worker.py:382-384).

    ``shard_merge`` selects the cross-shard semantics:

    - ``"global"`` (default): one correct global aggregation over all shards —
      Spark's partial+final merge (our documented deviation from O7).
    - ``"concat"``: bug-for-bug reference parity — aggregate each shard
      independently and UNION ALL the partials WITHOUT re-aggregation, so
      duplicate group keys across shards survive into the result, exactly as
      the reference controller's ``pa.concat_tables`` does
      (controller.py:276-294; client-side re-agg was never implemented,
      rpc.py:208).

    Missing shards are silently ignored; if none exist, returns ``None``
    (reference empty-result protocol — callers may prefer
    :meth:`ParquetEngine.groupby`, which returns an empty DataFrame instead).
    """
    if shard_merge not in ("global", "concat"):
        raise ValueError(f"shard_merge must be 'global' or 'concat', got {shard_merge!r}")

    # validate the full call shape BEFORE shard resolution so a malformed query
    # raises consistently whether or not its shards exist
    pred = compile_where_terms(where_terms)
    triples = normalize_agg_list(agg_list)
    aggs = compile_agg_list(agg_list) if aggregate else None

    def _one(df: DataFrame) -> DataFrame:
        if pred is not None:
            df = df.filter(pred)
        if not aggregate:
            proj: list[str] = []
            for c in list(groupby_cols) + [t[0] for t in triples]:
                if c not in proj:
                    proj.append(c)
            return df.select(*proj)
        if groupby_cols:
            return df.groupBy(*groupby_cols).agg(*aggs)
        return df.agg(*aggs)

    if shard_merge == "concat" and aggregate:
        existing = resolve_paths(paths, data_dir=data_dir, spark=spark)
        if not existing:
            return None
        parts = [_one(spark.read.parquet(p)) for p in existing]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    df = read_parquet(spark, paths, data_dir=data_dir)
    if df is None:
        return None
    return _one(df)


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
        """Cluster topology snapshot (controller.py:683-701 analog). Includes
        the data_dir's parquet file list — the files_map equivalent (workers
        advertise their data files, worker.py:155-168; here shared storage
        makes every file visible to every executor) — plus the reference's
        per-worker introspection facts re-expressed for executors: uptime
        (per-worker 'uptime', controller.py:692), busy/total counts
        ('busy_workers', controller.py:697-699), and per-executor host/core
        facts from the status tracker."""
        import os
        import time

        sc = self.spark.sparkContext
        data_files: list[str] = []
        if self.data_dir and os.path.isdir(self.data_dir):
            data_files = sorted(
                f for f in os.listdir(self.data_dir) if f.endswith(".parquet")
            )
        tracker = sc.statusTracker()
        return {
            "app_name": sc.appName,
            "app_id": sc.applicationId,
            "master": sc.master,
            "default_parallelism": sc.defaultParallelism,
            "spark_version": self.spark.version,
            "uptime_seconds": round(time.time() - sc.startTime / 1000.0, 3),
            "active_jobs": len(tracker.getActiveJobsIds()),
            "active_stages": len(tracker.getActiveStageIds()),
            "executors": [
                {
                    "host_port": f"{e.host()}:{e.port()}",
                    "running_tasks": e.numRunningTasks(),
                    "storage_memory_used": e.usedOnHeapStorageMemory()
                    + e.usedOffHeapStorageMemory(),
                }
                for e in sc._jsc.sc().statusTracker().getExecutorInfos()
            ],
            "data_dir": self.data_dir,
            "data_files": data_files,
        }

    def apply_pandas(
        self,
        filenames,
        fn,
        schema,
    ) -> DataFrame:
        """Typed replacement for the reference's ``execute_code`` RPC
        (controller.py:524-530 — arbitrary dotted-path import on a worker,
        documented as an accepted RCE tradeoff, README.md:119-125). Here user
        code runs as an Arrow-batched ``mapInPandas`` over the data instead:
        ``fn(iterator_of_pandas_batches) -> iterator_of_pandas_batches`` with a
        declared output ``schema`` — sandbox-equivalent to any other Spark job,
        no dynamic import surface.
        """
        df = read_parquet(self.spark, filenames, data_dir=self.data_dir)
        if df is None:
            return self.spark.createDataFrame([], schema=schema)
        return df.mapInPandas(fn, schema=schema)

    def loglevel(self, level: str) -> None:
        """Propagate log level (controller.py:498-510 analog)."""
        self.spark.sparkContext.setLogLevel(level)
