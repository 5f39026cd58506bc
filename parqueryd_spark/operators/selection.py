"""Exact distributed quantiles / rank selection without a global sort.

``percentile_approx`` answers fast but approximately; an exact answer via
``orderBy`` would shuffle the WHOLE table into one total order — the classic
100 TB anti-pattern. This module computes EXACT order statistics with the
multi-pass histogram-narrowing strategy (the distributed form of
Munro-Paterson selection): each pass is one map-side-combined aggregation
that bins only the surviving candidate interval, the driver handles nothing
but ~``bins`` cumulative counts per pass, and the interval's population
shrinks ~``bins``-fold per pass, so

    passes ≈ ceil(log_bins(n / exact_threshold))   (2-3 at 10^10+ rows)

Each pass's filter is a plain range predicate on the value column — it
reaches the parquet scan as a pushed filter, and composes with zone-map
manifests (sources/manifest.py) when the data is value-clustered, so later
(narrower) passes can skip most FILES, not just most rows. The final phase
resolves the answer inside the engine: ``orderBy(v).limit(r).agg(max(v))``
over the ≤ exact_threshold survivors — the max of the r smallest IS the
rank-r order statistic; one tiny scalar is collected, never the values.

Rank definition matches SQL ``quantile_disc``: the smallest value whose
cumulative share reaches p, i.e. rank = ceil(p·n) (1-indexed ascending),
with p interpreted as an exact decimal (Fraction) so p·n carries no binary
float error. NULLs are excluded on both sides; NaN values are not supported
(they poison range predicates — filter them upstream).

Reference parity note: the reference engine (parqueryd) exposes no quantile
aggregate at all (groupby methods are sum/mean/count/min/max/std/count_na/
count_distinct/sorted_count_distinct — see SURVEY.md §2 O5); exact and
approximate quantiles are north-star analytics scope, the exact tier next to
the mergeable-histogram estimates in operators/rollup.py.
"""

from __future__ import annotations

from fractions import Fraction
from math import ceil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _interval_filter(v: Column, lo: float, hi: float, hi_inclusive: bool) -> Column:
    cond = v >= F.lit(lo)
    return cond & (v <= F.lit(hi)) if hi_inclusive else cond & (v < F.lit(hi))


def exact_rank_value(
    df: DataFrame,
    value_col: str,
    rank: int,
    bins: int = 1024,
    exact_threshold: int = 65536,
    stats: dict | None = None,
) -> float | None:
    """The exact rank-th smallest non-null value (1-indexed). None on an
    empty (all-null) column. Each narrowing pass is one filtered aggregation
    job; the resolve phase is one more. ``rank`` outside [1, n] raises.
    Pass a dict as ``stats`` to receive {"passes": int, "resolve_rows": int}
    — the observability hook the scale probe uses to show pass depth stays
    logarithmic as n grows."""
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(v.alias("_v"))
    first = base.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi"), F.count("_v").alias("n")
    ).collect()[0]
    lo, hi, n = first["lo"], first["hi"], first["n"]
    if n == 0:
        return None
    if not 1 <= rank <= n:
        raise ValueError(f"rank {rank} outside [1, {n}]")

    vv = F.col("_v")
    offset = 0  # rows known to sort strictly before the current interval
    in_interval = n
    hi_inclusive = True
    passes = 0
    while in_interval > exact_threshold and hi > lo:
        passes += 1
        width = (hi - lo) / bins
        bin_col = F.least(F.lit(bins - 1), F.floor((vv - F.lit(lo)) / F.lit(width)).cast("int"))
        counts = dict(
            base.filter(_interval_filter(vv, lo, hi, hi_inclusive))
            .groupBy(bin_col.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        cum = offset
        landing, below = None, offset
        for b in range(bins):
            c = counts.get(b, 0)
            if cum + c >= rank:
                landing, below, in_bin = b, cum, c
                break
            cum += c
        assert landing is not None, "rank fell past the interval — count drift"
        new_lo = lo + landing * width
        new_hi = hi if landing == bins - 1 else lo + (landing + 1) * width
        new_inclusive = landing == bins - 1 and hi_inclusive
        if (new_lo, new_hi) == (lo, hi) or new_hi <= new_lo or in_bin == in_interval:
            # float-width floor: the interval can't subdivide further
            # (mass concentrated at one double) — resolve exactly.
            break
        lo, hi, hi_inclusive = new_lo, new_hi, new_inclusive
        offset, in_interval = below, in_bin

    if stats is not None:
        stats["passes"] = passes
        stats["resolve_rows"] = in_interval
    # resolve: max of the (rank - offset) smallest survivors == the answer
    row = (
        base.filter(_interval_filter(vv, lo, hi, hi_inclusive))
        .orderBy("_v")
        .limit(rank - offset)
        .agg(F.max("_v").alias("ans"))
        .collect()[0]
    )
    return row["ans"]


def quantile_rank(p, n: int) -> int:
    """quantile_disc's rank: smallest k with k/n >= p, i.e. ceil(p*n) in
    EXACT decimal arithmetic (Fraction of the string form, so 0.1*10 is 1,
    not 1.0000000000000002), clamped to at least 1."""
    r = ceil(Fraction(str(p)) * n)
    return max(1, min(r, n))


def exact_quantiles(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    probs: list[float],
    bins: int = 1024,
    exact_threshold: int = 65536,
) -> DataFrame:
    """Exact ``quantile_disc`` values for each prob: (prob, value) rows.

    One shared stats job, then an independent narrowing per prob (ranks land
    in different intervals after the first subdivision, so passes don't
    share filters; each is log_bins-deep). The result is the actual data
    element — exact, bit-for-bit reproducible by any engine's quantile_disc.
    """
    v = F.col(value_col).cast("double")
    n = df.filter(v.isNotNull()).count()
    rows = []
    for p in probs:
        val = (
            None
            if n == 0
            else exact_rank_value(df, value_col, quantile_rank(p, n), bins, exact_threshold)
        )
        rows.append((float(p), val))
    return spark.createDataFrame(rows, "prob double, value double")
