"""Scale operators: skew mitigation and co-located (bucketed) joins.

These address the two failure modes that appear only at cluster scale — a
skewed shuffle key melting one executor, and a repeated fact-fact join paying
its shuffle every query. Neither exists in the reference (its unit of
parallelism is a whole file, controller.py:628-645); they're table stakes for
the 100 TB posture.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _check_no_salt_column(df: DataFrame, side: str) -> None:
    """Reserved-column guard (mirrors group_aware_split's, ADVICE r7): a
    pre-existing ``__salt`` would be silently replaced by withColumn and then
    dropped, corrupting the caller's data."""
    if "__salt" in df.columns:
        raise ValueError(
            f"{side} input already has a '__salt' column — rename it before "
            "calling the salted operators ('__salt' is reserved internally)"
        )


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, method) where method is one of
    sum/count/min/max (the mergeable set; avg = sum+count composed by callers).
    Phase 1 groups on (key, salt) spreading each hot key over ``salt_buckets``
    reducers; phase 2 merges per-salt partials. Two small shuffles instead of
    one melted reducer.

    Note: AQE's skew handling covers *joins*; aggregation skew still needs
    salting when a handful of keys dominate (e.g. grouping 100 TB of web docs
    by domain).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _check_no_salt_column(df, "df")
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[phase1_fn[m](c).alias(out) for out, (c, m) in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merge_fn[m](out).alias(out) for out, (c, m) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed identically on the join key equi-join WITHOUT a shuffle
    (and without even a sort if sorted) — the 100 TB answer to "this fact-fact
    join runs every hour". Requires saveAsTable (bucket metadata lives in the
    catalog, not the parquet files).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Column | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two pre-bucketed catalog tables; with matching bucketing the plan
    shows no Exchange on either side (asserted in tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def skew_stats(
    df: DataFrame, keys: Sequence[str], top: int = 10
) -> tuple[DataFrame, dict]:
    """Diagnose a shuffle key BEFORE the join/groupBy melts an executor:
    returns (top-key frequency table, summary dict) where the summary holds
    ``n_rows``, ``n_keys``, ``max_key_rows``, ``skew_factor`` (hottest key's
    share over the uniform share — AQE's skew-join threshold thinking applied
    to key stats), and ``suggested_salt_buckets`` (hot-key rows over the
    average, capped at 64 — the bucket count that levels the hottest reducer
    to roughly the mean).

    One map-side-combined count per key plus a top-k heap; the summary is
    metadata-scale driver state, equivalent to collecting a broadcast dim.
    Feed ``suggested_salt_buckets`` straight into :func:`salted_groupby_agg`.
    """
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    summary_row = counts.agg(
        F.sum("n_rows").alias("total"),
        F.count("*").alias("n_keys"),
        F.max("n_rows").alias("max_key_rows"),
    ).first()
    total, n_keys, max_rows = (
        summary_row.total or 0,
        summary_row.n_keys or 0,
        summary_row.max_key_rows or 0,
    )
    mean = total / n_keys if n_keys else 0.0
    summary = {
        "n_rows": total,
        "n_keys": n_keys,
        "max_key_rows": max_rows,
        "skew_factor": (max_rows / mean) if mean else 0.0,
        "suggested_salt_buckets": min(64, max(1, round(max_rows / mean))) if mean else 1,
    }
    top_keys = counts.orderBy(F.col("n_rows").desc(), *keys).limit(top)
    return top_keys, summary


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the (smaller) right side across
    ``salt_buckets`` salt values and give every left row one deterministic
    salt, so a hot join key's rows spread over ``salt_buckets`` reducers
    instead of melting one.

    This is the HASH-join complement to AQE's skew handling: AQE splits
    oversized sort-merge partitions at runtime, but when the hot side must
    hash-join (or the skew is known up front — e.g. 100 TB of web events where
    one user/domain owns 1% of rows), pre-salting keeps every reducer near the
    mean. Cost: the right side is materialized ``salt_buckets`` times through
    the shuffle — size it with :func:`skew_stats`'s
    ``suggested_salt_buckets`` and keep it for dimension-to-low-10s-of-MB
    right sides.

    The left salt derives from xxhash64 over the WHOLE row (deterministic,
    uniform within a hot key — a salt from the key alone would land the whole
    key in one bucket again). Caveat (documented + tested): rows that are
    IDENTICAL in every column hash to the SAME salt, so a hot key consisting
    of exact duplicate rows still lands in one bucket — whole-row salting
    levels keys whose rows differ anywhere (the common case: payloads,
    timestamps, ids). If your skew is literal duplicate rows, aggregate them
    first (count) or add a disambiguating column before salting.

    Only left-preserving joins are valid: each left
    row meets each right match exactly once (its own salt), but a right row
    meets left rows in ALL buckets, so right/full/right-semi semantics would
    double-count. Supported: inner, left, left_outer, left_semi, left_anti.
    """
    keys = [on] if isinstance(on, str) else list(on)
    ok = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in ok:
        raise ValueError(f"salted_join supports left-preserving joins {sorted(ok)}, got {how!r}")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    _check_no_salt_column(left, "left")
    _check_no_salt_column(right, "right")
    lsalt = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*left.columns)), F.lit(salt_buckets)).cast("int")
    )
    rrep = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = lsalt.join(rrep, keys + ["__salt"], how)
    return out.drop("__salt")
