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
