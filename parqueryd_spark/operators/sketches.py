"""Distributed frequent-items (heavy hitters) via Misra–Gries summaries —
the sketch the built-in family (HLL++ distinct, approx quantiles; see
``events_sketch_aggs``) doesn't cover.

Exact top-k-by-frequency needs a full shuffle of every key occurrence; at
100 TB a high-cardinality key (user id, URL, shingle) makes that shuffle the
job. Misra–Gries ("Finding repeated elements", Sci. Comput. Program. 1982)
keeps only ``capacity`` counters per partition with a deterministic guarantee:
a partition summary undercounts any key by at most ⌊n_part/(capacity+1)⌋, and
summaries MERGE by plain counter addition with errors adding — so the
distributed form is: per-partition sketch (one Arrow-batched pass, bounded
memory), then one tiny shuffle of ≤ capacity × n_partitions rows. Any key
with true frequency > Σ⌊n_p/(capacity+1)⌋ is guaranteed to surface.

This is the pattern the engine uses for custom sketches Spark lacks: a
self-contained mapInPandas summarizer + an algebraic merge expressed as a
plain groupBy — no state stores, no driver collection.

Also here: the mergeable HLL distinct-count rollup (hll_rollup /
hll_rollup_merge / hll_estimate) over Spark's built-in Datasketches HLL
binary sketches — persisted distinct-count state that merges across
partitions/days without touching raw ids again.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-k most frequent values of ``key_col``.

    Returns (key, est_count, max_undercount) ordered by est_count desc, key
    asc: ``est_count ≤ true_count ≤ est_count + max_undercount`` — the bound
    is part of the result so callers can see whether ranks are separable.
    Deterministic for a fixed partitioning: ties in the counter-eviction path
    are broken by insertion order, and the final ordering is value-then-key.

    capacity trades memory for error: per-partition error ≤ ⌊n_p/(capacity+1)⌋
    and errors add across partitions. For a guaranteed catch of keys above
    fraction φ of ALL rows, use capacity ≥ 1/φ.
    """
    cap = int(capacity)
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    # NULL keys are excluded (NULL marks the per-partition error rows below,
    # and SQL count semantics skip NULL groups in frequency contexts anyway)
    df = df.where(F.col(key_col).isNotNull())

    def summarize(batches):
        # Misra–Gries with batch-vectorized counting: exact value_counts per
        # Arrow batch fold into the bounded counter set; decrement step
        # subtracts the minimum surviving count (the standard batched MG).
        import pandas as pd

        counters: dict = {}
        err = 0
        for pdf in batches:
            vc = pdf.iloc[:, 0].value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > cap:
                # evict: subtract the (cap+1)-th largest count from everyone;
                # anything ≤ 0 drops. One decrement round per batch, error
                # grows by the subtracted amount.
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {k_: v - cut for k_, v in counters.items() if v > cut}
                err += cut
        # counter rows + ONE marker row (key NULL) carrying this partition's
        # accumulated eviction error, so the merge can bound undercounts
        # without a second scan of the input
        yield pd.DataFrame(
            {
                "key": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                "err": [0] * len(counters) + [err],
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    summaries = df.select(F.col(key_col).alias("key")).mapInPandas(
        summarize, schema=f"key {key_type}, cnt long, err long"
    )
    # merge: counts add across partitions; a key absent from a partition's
    # summary was undercounted there by at most that partition's eviction
    # error, so Σ err over all partitions bounds any key's total undercount.
    bound = summaries.where(F.col("key").isNull()).agg(F.sum("err").alias("max_undercount"))
    merged = (
        summaries.where(F.col("key").isNotNull()).groupBy("key").agg(F.sum("cnt").alias("est_count"))
    )
    return (
        merged.join(F.broadcast(bound))
        .select(F.col("key").alias(key_col), "est_count", "max_undercount")
        .orderBy(F.col("est_count").desc(), F.col(key_col).asc())
        .limit(k)
    )


def hll_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Mergeable distinct-count state at rest: one Datasketches HLL sketch
    (binary, ~2^lgk bytes max) per group over ``value_col``.

    The 100 TB pattern this enables: sketch each day/partition ONCE at ingest
    (cost: one scan), persist the (keys..., user_sketch, n_rows) rows, and
    answer "distinct users for any key over any day range" by merging a
    handful of kilobyte sketches (:func:`hll_rollup_merge`) instead of
    re-shuffling every raw id — the same maintenance shape as
    operators/rollup.py's incremental_rollup, extended to the one aggregate
    (count distinct) plain partials can't merge.

    HLL union is register-wise max, so merge ∘ split ≡ sketching the whole
    input directly — bit-identical estimates, asserted in tests and checked
    against the oracle-backed events_hll_rollup_bound row (pytest +
    driver_sim; registered past the driver's 50-row gate window).
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup_merge(parts: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Union N hll_rollup outputs (e.g. per-day states) into one rollup at the
    same key grain: sketches merge with hll_union_agg (register-wise max),
    row counts add. Cost ∝ number of STATE rows, never the raw data."""
    from functools import reduce

    if not parts:
        raise ValueError("hll_rollup_merge needs at least one rollup part")
    all_parts = reduce(lambda a, b: a.unionByName(b), parts)
    return all_parts.groupBy(*keys).agg(
        F.hll_union_agg("hll").alias("hll"),
        F.sum("n_rows").alias("n_rows"),
    )


def hll_estimate(rollup: DataFrame, estimate_col: str = "n_distinct") -> DataFrame:
    """Finalize a rollup: replace the binary sketch with its cardinality
    estimate (standard error ~1.04/sqrt(2^lgk): ~0.8% at the default lgk=14)."""
    return rollup.withColumn(
        estimate_col, F.hll_sketch_estimate("hll").cast("long")
    ).drop("hll")
