"""Product-analytics operators over event streams: ordered funnels and
cohort retention — the interactive-OLAP workloads an events table exists for.

Scale design (10^12 events):

- **funnel_stages**: ONE shuffle on the user key. Events are collected and
  time-sorted per user, then a sequential fold walks the sorted array filling
  stage timestamps (stage i+1 must occur strictly after stage i) — all
  higher-order Column functions, JVM-side, no Python. The equivalent
  stage-by-stage min-join formulation (the DuckDB oracle uses it) shuffles
  the events table once PER STAGE; the fold trades that for per-user array
  state, which is bounded by per-user event count — salt extreme power users
  or pre-filter to the funnel's event types (the fold already drops
  non-funnel types before collecting).
- **cohort_retention**: two aggregations keyed by user / (cohort, period) —
  both partial-aggregate map-side; the distinct-activity collapse happens
  before the cohort join so the join input is |users x active periods|, not
  raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel stage timestamps: ``stage_ts[i]`` is the
    earliest event of ``stages[i]`` strictly after ``stage_ts[i-1]`` (the
    greedy earliest choice is optimal for chain funnels: taking a later
    stage-i event can only shrink the window for stage i+1). Returns one row
    per user who completed stage 0, with a ``stage_ts`` array holding the
    reached stages' timestamps (shorter array = dropped out earlier)."""
    typed = events.filter(F.col(type_col).isin(list(stages))).select(
        F.col(user_col).alias("user"),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")).alias("e"),
    )
    names = F.array(*[F.lit(s) for s in stages])
    per_user = typed.groupBy("user").agg(
        F.array_sort(F.collect_list("e")).alias("evs")
    )
    # fold: acc is the array of reached-stage timestamps; event e extends it
    # iff e is the next stage's type and strictly later than the last fill
    stage_ts = F.aggregate(
        F.col("evs"),
        F.array().cast("array<timestamp>"),
        lambda acc, e: F.when(
            (F.size(acc) < F.lit(len(stages)))
            & (e["t"] == F.element_at(names, F.size(acc) + 1))
            & ((F.size(acc) == 0) | (e["ts"] > F.element_at(acc, -1))),
            F.concat(acc, F.array(e["ts"])),
        ).otherwise(acc),
    )
    return (
        per_user.select("user", stage_ts.alias("stage_ts"))
        .filter(F.size("stage_ts") >= 1)
    )


def funnel_summary(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The report on top of :func:`funnel_stages`: per stage, users reaching
    it and mean seconds from funnel entry (over users who reached the stage).
    One pass: a user reaching stage i contributes a posexplode row for every
    stage <= i, so a per-stage groupBy over the exploded rows yields every
    stage's count without recomputing the funnel per stage."""
    per_user = funnel_stages(events, stages, user_col, ts_col, type_col)
    names = F.array(*[F.lit(s) for s in stages])
    exploded = per_user.select(
        F.posexplode("stage_ts").alias("idx", "t"),
        F.element_at("stage_ts", 1).alias("t0"),
    )
    return (
        exploded.groupBy("idx")
        .agg(
            F.count("*").alias("n_users"),
            F.avg(F.col("t").cast("double") - F.col("t0").cast("double")).alias(
                "avg_secs_from_entry"
            ),
        )
        .select(
            (F.col("idx") + 1).cast("int").alias("stage"),
            F.element_at(names, F.col("idx") + 1).alias("stage_name"),
            "n_users",
            "avg_secs_from_entry",
        )
    )


def cohort_retention(
    events: DataFrame,
    grain: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention triangle: cohort = the user's first active period
    (``date_trunc(grain)``), and for each (cohort, periods-since) the count
    of cohort users active in that period plus the retention rate against the
    cohort's size. Returns (cohort, offset, n_active, cohort_size,
    retention)."""
    secs = {"day": 86400, "week": 604800}[grain]
    period = F.date_trunc(grain, F.col(ts_col))
    activity = events.select(
        F.col(user_col).alias("user"), period.alias("period")
    ).distinct()
    cohorts = activity.groupBy("user").agg(F.min("period").alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    joined = activity.join(cohorts, "user").withColumn(
        "offset",
        ((F.col("period").cast("double") - F.col("cohort").cast("double")) / secs)
        .cast("long"),
    )
    return (
        joined.groupBy("cohort", "offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .withColumn(
            "retention", F.col("n_active") / F.col("cohort_size").cast("double")
        )
    )


def _nullsafe_key_join(left: DataFrame, right: DataFrame, ks: Sequence[str], how: str = "inner") -> DataFrame:
    """Key equi-join that keeps NULL-keyed groups (SQL GROUP BY treats NULL as
    a real group; a plain name-based join would silently drop those rows) —
    the same eqNullSafe convention as exact_group_quantiles / k_anonymize."""
    r = right
    for k in ks:
        # rename to break self-join attribute lineage (right derives from left)
        r = r.withColumnRenamed(k, f"_bk_{k}")
    cond = None
    for k in ks:
        c = F.col(k).eqNullSafe(F.col(f"_bk_{k}"))
        cond = c if cond is None else cond & c
    return left.join(r, cond, how).drop(*[f"_bk_{k}" for k in ks])


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    threshold: float = 3.5,
    scale: float = 1.4826,
    approx: bool = False,
) -> DataFrame:
    """Robust per-group anomaly flagging via the median absolute deviation
    (the Iglewicz-Hoaglin modified z-score: |x - median| / (scale * MAD),
    flag above ``threshold``; scale 1.4826 makes MAD consistent with sigma
    under normality, threshold 3.5 is the standard recommendation). Unlike
    mean/std z-scores, the median/MAD baseline doesn't move when the
    anomalies themselves land in the window — the property that matters for
    monitoring ingest pipelines. (Reference parity: no anomaly or analytic
    surface exists in the reference RPC dispatch —
    /root/reference/parqueryd/controller.py:483-553; north-star analytics
    scope.)

    Returns the input rows plus (med, mad, robust_z, is_outlier). Groups
    with MAD = 0 (over half the group at one value) get NULL robust_z and
    is_outlier = false — deviation from a degenerate baseline has no robust
    scale to judge against; screen those groups with exact predicates
    instead.

    Scale shape (r15 optimization, guide §2.4 "window functions partitioned
    by the same key as a preceding aggregation do not need a second
    shuffle"): ONE exchange on the group keys, then both medians as chained
    unbounded-window aggregates over that same partitioning — the previous
    aggregate+join-back formulation shuffled the input three times (median
    aggregation, deviation join probe, flag join probe) for identical
    answers. Memory posture is unchanged: an exact percentile buffers the
    whole group's values on one task whether it runs as an aggregate or a
    window, so the window form costs no extra skew exposure; at extreme
    per-group cardinality pass ``approx=True`` to switch both medians to
    percentile_approx (bounded memory, rank error <= 1/accuracy) — same
    plan shape, estimates instead of exact medians. NULL values pass
    through unflagged (no deviation to judge). The decomposed
    :func:`mad_baselines` + :func:`flag_with_baselines` pair (the
    frozen-baseline / streaming architecture) keeps the join formulation —
    there the baseline table is computed on a DIFFERENT window than the
    scored rows, so a join is fundamental.
    """
    from pyspark.sql import Window as W

    ks = list(keys)
    v = F.col(value_col).cast("double")

    def _median(col):
        return F.percentile_approx(col, 0.5, 10000) if approx else F.percentile(col, 0.5)

    w = W.partitionBy(*ks)
    dev = df.withColumn("med", _median(v).over(w)).withColumn(
        "_absdev", F.abs(v - F.col("med"))
    )
    dev = dev.withColumn("mad", _median(F.col("_absdev")).over(w))
    z = F.col("_absdev") / (F.lit(scale) * F.col("mad"))
    return (
        dev.withColumn("robust_z", F.when(F.col("mad") > 0, z))
        .withColumn(
            "is_outlier", F.coalesce(F.col("robust_z") > F.lit(threshold), F.lit(False))
        )
        .drop("_absdev")
    )


def mad_baselines(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    approx: bool = False,
) -> DataFrame:
    """Per-group (keys..., med, mad) robust baselines — the frozen, reusable
    half of :func:`mad_outliers`: compute on a trusted reference window,
    persist, and score later data (or a live stream,
    streaming/quality.py:stream_flag_outliers) against it without the
    anomalies contaminating their own yardstick. NULL-keyed groups are real
    groups (null-safe joins), matching SQL GROUP BY semantics."""
    ks = list(keys)
    v = F.col(value_col).cast("double")

    def _median(col):
        return F.percentile_approx(col, 0.5, 10000) if approx else F.percentile(col, 0.5)

    med = df.filter(v.isNotNull()).groupBy(*ks).agg(_median(v).alias("med"))
    # null-SAFE key join: NULL-keyed groups are real groups and get baselines
    dev = _nullsafe_key_join(df, med, ks).withColumn("_absdev", F.abs(v - F.col("med")))
    return (
        dev.filter(F.col("_absdev").isNotNull())
        .groupBy(*ks)
        .agg(F.max("med").alias("med"), _median(F.col("_absdev")).alias("mad"))
    )


def flag_with_baselines(
    df: DataFrame,
    baselines: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    threshold: float = 3.5,
    scale: float = 1.4826,
) -> DataFrame:
    """Score rows against given (keys..., med, mad) baselines: one left
    equi-join + pure Column arithmetic (stateless — exactly what a streaming
    micro-batch can apply against a FROZEN baseline table). Rows whose group
    has no baseline, NULL values, and MAD-0 groups all get NULL robust_z and
    is_outlier = false."""
    ks = list(keys)
    v = F.col(value_col).cast("double")
    dev = _nullsafe_key_join(df, baselines, ks, "left").withColumn(
        "_absdev", F.abs(v - F.col("med"))
    )
    z = F.col("_absdev") / (F.lit(scale) * F.col("mad"))
    return (
        dev.withColumn("robust_z", F.when(F.col("mad") > 0, z))
        .withColumn(
            "is_outlier", F.coalesce(F.col("robust_z") > F.lit(threshold), F.lit(False))
        )
        .drop("_absdev")
    )
