"""Streaming ingest that keeps the zone-map skipping manifest FRESH: each
micro-batch lands as an idempotent ``batch=<id>`` partition and the published
manifest is incrementally refreshed in the same foreachBatch — so the
serve-path pruned scans (``sources/manifest.py:scan_pruned`` over a persisted
manifest) never go stale under continuous ingest.

Why this shape at scale: a 100 TB dataset under continuous ingest adds a few
files per trigger; ``refresh_manifest`` footer-sweeps ONLY those (O(new
files), never the standing corpus) and drops rows for files a replayed batch
overwrote. The manifest republishes through the same write-then-swap pattern
the data uses, so readers either see the previous complete generation or the
new one — and even a reader racing a swap stays CORRECT, because round 9's
staleness guard makes ``scan_pruned``/``count_pruned`` conservatively keep
any live file the manifest doesn't cover (a stale manifest costs speed,
never rows).

Replay safety: data lands with ``mode=overwrite`` into its own ``batch=<id>``
directory (the at-least-once contract every streaming sink here follows), and
the refresh reconciles the manifest against the ACTUAL file listing — a
replayed batch's rewritten part-files displace their predecessors' rows
automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stream_ingest_with_manifest(
    stream: DataFrame,
    data_dir: str,
    manifest_dir: str,
    checkpoint_dir: str,
    columns: list[str] | None = None,
):
    """Start an availableNow foreachBatch query appending each micro-batch to
    ``data_dir/batch=<id>`` and republishing the refreshed zone-map manifest
    to ``manifest_dir``. Returns the started StreamingQuery (callers
    ``awaitTermination()``)."""
    from parqueryd_spark.sources.manifest import build_manifest, refresh_manifest

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("overwrite").parquet(
            os.path.join(data_dir, f"batch={batch_id}")
        )
        live = os.path.join(manifest_dir, "live")
        if os.path.isdir(live):
            mf = refresh_manifest(spark, data_dir, spark.read.parquet(live), columns)
        else:
            mf = build_manifest(spark, data_dir, columns)
        # write-then-swap: stage the new generation, then replace — readers
        # hold the old generation's file handles or fall back to the
        # conservative keep-uncovered path mid-swap
        stage = os.path.join(manifest_dir, f"stage-{batch_id}")
        mf.write.mode("overwrite").parquet(stage)
        import shutil

        old = os.path.join(manifest_dir, f"old-{batch_id}")
        if os.path.isdir(live):
            os.replace(live, old)
        os.replace(stage, live)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_pruned(
    spark: SparkSession,
    data_dir: str,
    manifest_dir: str,
    where_terms,
    select=None,
) -> DataFrame:
    """Serve-path read over the streaming-maintained dataset: the published
    manifest prunes files at plan time, the exact compiled filter runs on the
    survivors — identical results to a full scan, fresh as of the last
    completed trigger."""
    from parqueryd_spark.sources.manifest import scan_pruned

    return scan_pruned(
        spark,
        data_dir,
        where_terms,
        manifest=spark.read.parquet(os.path.join(manifest_dir, "live")),
        select=select,
    )
