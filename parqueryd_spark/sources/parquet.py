"""Parquet source: path resolution with the reference's silent-missing semantics.

The reference controller filters the requested filename list against the files it
knows about and silently proceeds with the survivors; an all-missing query yields
an empty result, not an error (reference: parqueryd/controller.py:618-621,
RELEASE_NOTES.rst:63-65 "Ignore missing files instead of throwing an error").
Spark's ``read.parquet`` raises on missing paths, so we pre-filter for existence.

At scale the "table" is a directory of many Parquet files on shared storage;
``spark.read.parquet(*paths)`` maps each row-group/split to a task, which strictly
generalizes the reference's 1-file-=-1-worker model (controller.py:628-645).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def resolve_paths(
    paths: Sequence[str] | str,
    data_dir: str | None = None,
) -> list[str]:
    """Resolve bare filenames against ``data_dir`` (the reference's worker
    ``data_dir`` convention, worker.py:388) and drop paths that don't exist.

    Directories (multi-file datasets) count as existing; bare names get the
    ``.parquet`` extension tried as a fallback, mirroring the reference's
    ``DATA_FILE_EXTENSION`` convention (worker.py:44).
    """
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        candidates = [p]
        if data_dir is not None and not os.path.isabs(p):
            candidates = [os.path.join(data_dir, p), p]
        resolved = None
        for c in candidates:
            if os.path.exists(c):
                resolved = c
                break
            if not c.endswith(".parquet") and os.path.exists(c + ".parquet"):
                resolved = c + ".parquet"
                break
        if resolved is not None:
            out.append(resolved)
    return out


def read_parquet(
    spark: SparkSession,
    paths: Sequence[str] | str,
    data_dir: str | None = None,
    merge_schema: bool = False,
) -> DataFrame | None:
    """Read one logical table from N parquet shards, silently ignoring missing
    shards. Returns ``None`` when *no* shard exists (the reference's empty-result
    protocol, controller.py:303-305 / rpc.py:151-153); callers decide whether to
    surface ``None`` or an empty DataFrame."""
    existing = resolve_paths(paths, data_dir=data_dir)
    if not existing:
        return None
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*existing)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) by name.

    The events table carries parquet TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; read nanos as long and convert to a microsecond timestamp
    with exact integer division (``div``, not ``/`` — a double would lose
    precision at 1e18), matching DuckDB's ns->us truncation on read.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros yields TIMESTAMP (session-tz rendered); force UTC so
        # wall-clock values match DuckDB's naive read even under a non-UTC
        # driver session. (NTZ would be cleaner but watermarks and double-casts
        # require plain TIMESTAMP.)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)
