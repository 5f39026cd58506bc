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

    ALL ranks narrow in SHARED passes: per level the still-active ranks'
    intervals go out as one broadcast frame, each row lands in every
    interval that covers it (a ≤ len(probs)-row broadcast product, filtered
    at the scan), and one aggregation returns per-(rank, bin) counts — so a
    5-quantile request costs the same ~log_bins scan count as one quantile,
    not 5x. The resolve step answers every rank in one job: a per-rank
    window over its ≤ exact_threshold survivors. The result is the actual
    data element — exact, bit-for-bit reproducible by any engine's
    quantile_disc.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(v.alias("_v"))
    first = base.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi"), F.count("_v").alias("n")
    ).collect()[0]
    n = first["n"]
    if n == 0:
        return spark.createDataFrame([(float(p), None) for p in probs], "prob double, value double")

    # per-prob narrowing state: pid -> [lo, hi, offset, in_interval, incl, rank]
    state = {
        i: [first["lo"], first["hi"], 0, n, True, quantile_rank(p, n)]
        for i, p in enumerate(probs)
    }
    schema = "_pid int, _lo double, _hi double, _w double, _incl boolean, _take long"

    def _intervals_df(pids):
        rows = [
            (pid, st[0], st[1], (st[1] - st[0]) / bins, bool(st[4]), st[5] - st[2])
            for pid, st in state.items()
            if pid in pids
        ]
        return spark.createDataFrame(rows, schema)

    in_window = (F.col("_v") >= F.col("_lo")) & (
        (F.col("_v") < F.col("_hi")) | (F.col("_incl") & (F.col("_v") <= F.col("_hi")))
    )
    active = {pid for pid, st in state.items() if st[3] > exact_threshold and st[1] > st[0]}
    while active:
        joined = base.crossJoin(F.broadcast(_intervals_df(active))).where(in_window)
        bin_col = F.least(
            F.lit(bins - 1), F.floor((F.col("_v") - F.col("_lo")) / F.col("_w")).cast("int")
        )
        counts: dict[int, dict[int, int]] = {}
        for r in joined.groupBy("_pid", bin_col.alias("_b")).agg(
            F.count(F.lit(1)).alias("_c")
        ).collect():
            counts.setdefault(r["_pid"], {})[r["_b"]] = r["_c"]
        next_active = set()
        for pid in active:
            lo, hi, offset, in_interval, incl, rank = state[pid]
            width = (hi - lo) / bins
            cum = offset
            landing = None
            for b in range(bins):
                c = counts.get(pid, {}).get(b, 0)
                if cum + c >= rank:
                    landing, below, in_bin = b, cum, c
                    break
                cum += c
            assert landing is not None, f"rank fell past the interval for prob {probs[pid]}"
            new_lo = lo + landing * width
            new_hi = hi if landing == bins - 1 else lo + (landing + 1) * width
            new_incl = landing == bins - 1 and incl
            if (new_lo, new_hi) == (lo, hi) or new_hi <= new_lo or in_bin == in_interval:
                continue  # float-width floor: resolve this rank as-is
            state[pid] = [new_lo, new_hi, below, in_bin, new_incl, rank]
            if in_bin > exact_threshold and new_hi > new_lo:
                next_active.add(pid)
        active = next_active

    # resolve every rank in one job: (rank - offset)-th smallest survivor
    from pyspark.sql import Window as W

    survivors = base.crossJoin(F.broadcast(_intervals_df(set(state)))).where(in_window)
    rn = F.row_number().over(W.partitionBy("_pid").orderBy("_v"))
    answers = {
        r["_pid"]: r["_v"]
        for r in survivors.withColumn("_rn", rn)
        .where(F.col("_rn") == F.col("_take"))
        .select("_pid", "_v")
        .collect()
    }
    return spark.createDataFrame(
        [(float(p), answers.get(i)) for i, p in enumerate(probs)], "prob double, value double"
    )


def exact_group_quantiles(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p: float,
    bins: int = 64,
    exact_threshold: int = 65536,
    max_groups: int = 4096,
) -> DataFrame:
    """Exact per-GROUP ``quantile_disc`` values — (keys..., prob, value) —
    with ALL groups narrowed simultaneously: every pass is ONE aggregation
    job shared by every still-active group, not a pass per group.

    Per pass: the driver holds one (lo, hi, offset) interval per active
    group (metadata scale, bounded by ``max_groups``); a broadcast
    intervals-DataFrame joins each row to its group's interval, rows outside
    drop, and one groupBy(keys, bin) count comes back (≤ active_groups x
    bins rows — the driver-side budget that ``max_groups`` caps; beyond it
    use the mergeable histogram estimates in operators/rollup.py). Groups
    whose candidate population reaches ``exact_threshold`` leave the loop;
    the final RESOLVE is one distributed job for all groups at once: a
    per-group window over the ≤ threshold survivors picks the
    (rank - offset)-th smallest — answers never funnel through the driver.

    Group-count sweet spot is the dashboard regime (10s-1000s of groups over
    billions of rows each). NULL values are excluded per group; groups with
    no non-null values are absent from the output (matching SQL GROUP BY
    aggregate semantics).
    """
    ks = list(keys)
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(*ks, v.alias("_v"))
    stats = base.groupBy(*ks).agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi"), F.count("_v").alias("n")
    )
    srows = stats.collect()
    if len(srows) > max_groups:
        raise ValueError(
            f"{len(srows)} groups exceeds max_groups={max_groups} — the per-pass "
            "driver-side count collect is groups x bins; use the mergeable "
            "histogram quantiles (operators/rollup.py) for high-cardinality keys"
        )
    # per-group narrowing state: key tuple -> [lo, hi, offset, in_interval,
    # hi_inclusive, rank]
    state = {
        tuple(r[k] for k in ks): [r["lo"], r["hi"], 0, r["n"], True, quantile_rank(p, r["n"])]
        for r in srows
    }

    def _intervals_df(names):
        rows = [
            (*g, st[0], st[1], (st[1] - st[0]) / bins, bool(st[4]), st[5] - st[2])
            for g, st in state.items()
            if g in names
        ]
        schema = stats.select(*ks).schema.add("_lo", "double").add("_hi", "double")
        schema = schema.add("_w", "double").add("_incl", "boolean").add("_take", "long")
        return spark.createDataFrame(rows, schema)

    in_window = F.col("_v") >= F.col("_lo")
    in_window = in_window & (
        (F.col("_v") < F.col("_hi")) | (F.col("_incl") & (F.col("_v") <= F.col("_hi")))
    )
    active = {g for g, st in state.items() if st[3] > exact_threshold and st[1] > st[0]}
    while active:
        joined = base.join(F.broadcast(_intervals_df(active)), ks).where(in_window)
        bin_col = F.least(
            F.lit(bins - 1), F.floor((F.col("_v") - F.col("_lo")) / F.col("_w")).cast("int")
        )
        counts: dict[tuple, dict[int, int]] = {}
        for r in joined.groupBy(*ks, bin_col.alias("_b")).agg(
            F.count(F.lit(1)).alias("_c")
        ).collect():
            counts.setdefault(tuple(r[k] for k in ks), {})[r["_b"]] = r["_c"]
        next_active = set()
        for g in active:
            lo, hi, offset, in_interval, incl, rank = state[g]
            width = (hi - lo) / bins
            cum = offset
            landing = None
            for b in range(bins):
                c = counts.get(g, {}).get(b, 0)
                if cum + c >= rank:
                    landing, below, in_bin = b, cum, c
                    break
                cum += c
            assert landing is not None, f"rank fell past the interval for group {g}"
            new_lo = lo + landing * width
            new_hi = hi if landing == bins - 1 else lo + (landing + 1) * width
            new_incl = landing == bins - 1 and incl
            if (new_lo, new_hi) == (lo, hi) or new_hi <= new_lo or in_bin == in_interval:
                continue  # float-width floor: resolve this group as-is
            state[g] = [new_lo, new_hi, below, in_bin, new_incl, rank]
            if in_bin > exact_threshold and new_hi > new_lo:
                next_active.add(g)
        active = next_active

    # resolve every group in one distributed job: (rank - offset)-th smallest
    # survivor per group via a bounded per-group window
    from pyspark.sql import Window as W

    survivors = base.join(F.broadcast(_intervals_df(set(state))), ks).where(in_window)
    rn = F.row_number().over(W.partitionBy(*ks).orderBy("_v"))
    return (
        survivors.withColumn("_rn", rn)
        .where(F.col("_rn") == F.col("_take"))
        .select(*ks, F.lit(float(p)).alias("prob"), F.col("_v").alias("value"))
    )
