"""Product-analytics queries over the events table: ordered funnel and
cohort retention (operators/analytics.py). Registered past the gate window;
oracle-checked by tests/test_registry_oracle.py and tools/driver_sim.py.

The Spark funnel is a one-shuffle per-user fold; the oracle recomputes it
with the stage-by-stage min-join formulation (earliest stage-i event strictly
after stage i-1), which is semantically identical for chain funnels — the
greedy earliest timestamp is optimal — so the two independent algorithms
cross-check each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators.analytics import cohort_retention, funnel_summary
from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table

_STAGES = ["view", "click", "purchase"]


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS stage_name, count(*) AS n_users,
           round(avg(0.0), 4) AS avg_secs_from_entry FROM s1
    UNION ALL
    SELECT 2, 'click', count(*), round(avg(epoch(t2) - epoch(t1)), 4)
    FROM s2 JOIN s1 USING (user_id)
    UNION ALL
    SELECT 3, 'purchase', count(*), round(avg(epoch(t3) - epoch(t1)), 4)
    FROM s3 JOIN s1 USING (user_id)
    """,
    bench=True,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel: per stage, users reaching it
    (each stage's event strictly after the previous stage's) and mean seconds
    from funnel entry."""
    ev = load_table(spark, sf_dir, "events")
    # float agg rounded in BOTH engines: the gate's value hash does not round
    return funnel_summary(ev, _STAGES).withColumn(
        "avg_secs_from_entry", F.round("avg_secs_from_entry", 4)
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT hour_start, event_type, n,
             avg(n)         OVER w AS mu,
             stddev_samp(n) OVER w AS sigma,
             count(*)       OVER w AS n_window
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour_start, event_type, n,
           round(mu, 4) AS mu,
           round((n - mu) / sigma, 4) AS zscore,
           abs((n - mu) / sigma) > 3.0 AS is_anomaly
    FROM scored
    WHERE n_window >= 12 AND sigma > 0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over hourly event counts: each
    (hour, type) count is scored against the trailing 24 observed hours
    (excluding itself), flagged when it sits more than 3 sigma out. Warm-up
    hours (under 12 trailing points) and zero-variance windows are excluded
    rather than scored against garbage. The whole detector is one windowed
    aggregation after one groupBy — at 10^12 events the hourly rollup is the
    only full-data pass, and it map-side combines."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-24, -1)
    )
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w)
    return (
        hourly.withColumn("mu", F.avg("n").over(w))
        .withColumn("sigma", F.stddev_samp("n").over(w))
        .withColumn("n_window", F.count("*").over(w))
        .filter((F.col("n_window") >= 12) & (F.col("sigma") > 0))
        .select(
            "hour_start",
            "event_type",
            "n",
            F.round("mu", 4).alias("mu"),
            F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4).alias("zscore"),
            (F.abs((F.col("n") - F.col("mu")) / F.col("sigma")) > 3.0).alias(
                "is_anomaly"
            ),
        )
    )


@query(
    "events_histogram_quantiles",
    oracle="""
    WITH hist AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS window_start, event_type,
             least(65, greatest(0, CAST(floor(value / 5.0) AS INT))) AS bin,
             count(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT *, sum(n) OVER (PARTITION BY window_start, event_type
                             ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY window_start, event_type) AS total
      FROM hist
    ),
    est AS (
      SELECT window_start, event_type, p.prob,
             bin, n, cum, total,
             row_number() OVER (PARTITION BY window_start, event_type, p.prob
                                ORDER BY bin) AS rn
      FROM cum, (SELECT unnest([0.5, 0.9]) AS prob) p
      WHERE cum >= total * p.prob
    )
    SELECT window_start, event_type, prob,
           round((bin + (total * prob - (cum - n)) / n) * 5.0, 4) AS quantile_est
    FROM est WHERE rn = 1
    """,
)
def events_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90 of event values served from MERGEABLE histogram rollup
    state (operators/rollup.py histogram_partials + histogram_quantiles,
    [0, 330) in 66 bins) — the quantile the maintained-rollup table answers
    without touching raw data. The oracle rebuilds the identical histogram
    walk in SQL, so binning, cumulative ranks, and in-bin interpolation all
    hash-match exactly."""
    from parqueryd_spark.operators.rollup import (
        histogram_partials,
        histogram_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    hist = histogram_partials(ev, 0.0, 330.0, 66, grain="1 day")
    est = histogram_quantiles(hist, [0.5, 0.9], 0.0, 330.0, 66)
    return est.withColumn("quantile_est", F.round("quantile_est", 4))


@query(
    "events_cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS period FROM events
    ),
    cohorts AS (SELECT u, min(period) AS cohort FROM activity GROUP BY u),
    sizes AS (SELECT cohort, count(*) AS cohort_size FROM cohorts GROUP BY cohort)
    SELECT a.cohort,
           CAST((epoch(a.period) - epoch(a.cohort)) / 604800 AS BIGINT) AS "offset",
           count(*) AS n_active,
           s.cohort_size,
           round(count(*) / CAST(s.cohort_size AS DOUBLE), 4) AS retention
    FROM (SELECT act.u, act.period, c.cohort FROM activity act JOIN cohorts c USING (u)) a
    JOIN sizes s USING (cohort)
    GROUP BY a.cohort, "offset", s.cohort_size
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped into cohorts by first active
    week; per (cohort, weeks-since) the active-user count and retention rate
    against the cohort's size."""
    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, grain="week").withColumn(
        "retention", F.round("retention", 4)
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
      FROM events e JOIN med m USING (event_type)
      WHERE e.value IS NOT NULL
    ), mad AS (
      SELECT event_type, quantile_cont(absdev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(d.value) AS n_values,
           CAST(count(CASE WHEN md.mad > 0
                            AND d.absdev / (1.4826 * md.mad) > 3.5
                           THEN 1 END) AS BIGINT) AS n_outliers,
           round(max(d.med), 6) AS med,
           round(max(md.mad), 6) AS mad,
           round(max(CASE WHEN md.mad > 0
                          THEN d.absdev / (1.4826 * md.mad) END), 6) AS max_robust_z
    FROM dev d JOIN mad md USING (event_type)
    GROUP BY d.event_type
    """,
    bench=True,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection (operators/analytics.py:mad_outliers): the
    Iglewicz-Hoaglin modified z-score per event type — median/MAD baselines
    that outliers can't drag, two exact-percentile aggregations + two
    key-joins. Reported per type: value count, flagged-outlier count, the
    median and MAD baselines, and the worst modified z-score. Spark's exact
    percentile and DuckDB's quantile_cont share the linear-interpolation
    definition bit-for-bit, so the flag COUNTS are externally value-checked,
    not just the rounded baselines."""
    from parqueryd_spark.operators.analytics import mad_outliers

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    flagged = mad_outliers(ev, ["event_type"], "value")
    return flagged.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.count(F.when(F.col("is_outlier"), 1)).alias("n_outliers"),
        F.round(F.max("med"), 6).alias("med"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.round(F.max("robust_z"), 6).alias("max_robust_z"),
    )
