"""Unit tests for the product-analytics operators (operators/analytics.py):
ordered-funnel stage semantics and cohort retention offsets."""

from __future__ import annotations

from datetime import datetime

from parqueryd_spark.operators.analytics import (
    cohort_retention,
    funnel_stages,
    funnel_summary,
)

_SCHEMA = "user_id long, ts timestamp, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t) for u, d, h, t in rows], _SCHEMA
    )


STAGES = ["view", "click", "purchase"]


def test_funnel_requires_stage_order(spark):
    ev = _ev(
        spark,
        [
            # u1: full funnel in order
            (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
            # u2: clicked BEFORE viewing — click must not count; no later click
            (2, 1, 1, "click"), (2, 1, 2, "view"), (2, 1, 3, "purchase"),
            # u3: view then purchase, never clicked — stops at stage 1
            (3, 1, 0, "view"), (3, 1, 1, "purchase"),
            # u4: never viewed — not in the funnel at all
            (4, 1, 0, "click"), (4, 1, 1, "purchase"),
        ],
    )
    got = {r.user: len(r.stage_ts) for r in funnel_stages(ev, STAGES).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_takes_earliest_qualifying_event(spark):
    # two clicks after the view: the EARLIER one is the stage timestamp, and
    # a purchase between them still completes the funnel
    ev = _ev(
        spark,
        [(1, 1, 0, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"), (1, 1, 5, "click")],
    )
    [row] = funnel_stages(ev, STAGES).collect()
    assert [t.hour for t in row.stage_ts] == [0, 2, 3]


def test_funnel_summary_counts_and_latency(spark):
    ev = _ev(
        spark,
        [
            (1, 1, 0, "view"), (1, 1, 2, "click"),
            (2, 1, 0, "view"), (2, 1, 4, "click"),
            (3, 1, 0, "view"),
        ],
    )
    rows = {r.stage: r for r in funnel_summary(ev, STAGES).collect()}
    assert rows[1].n_users == 3 and rows[1].avg_secs_from_entry == 0.0
    assert rows[2].n_users == 2
    assert rows[2].avg_secs_from_entry == 3 * 3600  # mean of 2h and 4h
    assert 3 not in rows  # nobody purchased


def test_cohort_retention_offsets(spark):
    # u1 first active Jan 1 week, returns 2 weeks later; u2 same cohort, never
    # returns; u3 joins the next week
    ev = _ev(
        spark,
        [
            (1, 1, 0, "view"), (1, 15, 0, "view"),
            (2, 2, 0, "view"),
            (3, 8, 0, "view"),
        ],
    )
    rows = {
        (r.cohort.day, r.offset): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(ev, grain="week").collect()
    }
    # week of Jan 1 2024 starts Mon Jan 1
    assert rows[(1, 0)] == (2, 2, 1.0)
    assert rows[(1, 2)] == (1, 2, 0.5)
    assert rows[(8, 0)] == (1, 1, 1.0)
    assert set(rows) == {(1, 0), (1, 2), (8, 0)}


def _vals(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


def test_mad_outliers_hand_computed(spark):
    from parqueryd_spark.operators.analytics import mad_outliers

    # group a: values 1..7 plus a wild 100 -> median 4.5, absdevs
    # [3.5,2.5,1.5,0.5,0.5,1.5,2.5,95.5] -> MAD 2.0; z(100) = 95.5/2.9652
    rows = [("a", float(v)) for v in range(1, 8)] + [("a", 100.0)]
    out = {r["value"]: r for r in mad_outliers(_vals(spark, rows), ["event_type"]).collect()}
    assert out[100.0]["med"] == 4.5 and out[100.0]["mad"] == 2.0
    assert round(out[100.0]["robust_z"], 6) == round(95.5 / (1.4826 * 2.0), 6)
    assert out[100.0]["is_outlier"]
    assert not out[1.0]["is_outlier"] and not out[7.0]["is_outlier"]


def test_mad_zero_group_flags_nothing(spark):
    from parqueryd_spark.operators.analytics import mad_outliers

    rows = [("b", 5.0)] * 6 + [("b", 9.0)]  # MAD = 0: no robust scale
    out = mad_outliers(_vals(spark, rows), ["event_type"]).collect()
    assert all(r["robust_z"] is None for r in out)
    assert all(not r["is_outlier"] for r in out)


def test_mad_nulls_pass_through_unflagged(spark):
    from parqueryd_spark.operators.analytics import mad_outliers

    rows = [("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", None)]
    out = mad_outliers(_vals(spark, rows), ["event_type"]).collect()
    assert len(out) == 4
    nul = [r for r in out if r["value"] is None][0]
    assert nul["robust_z"] is None and not nul["is_outlier"]


def test_mad_approx_path_agrees_on_small_groups(spark):
    from parqueryd_spark.operators.analytics import mad_outliers

    rows = [("a", float(v)) for v in range(1, 8)] + [("a", 100.0)]
    exact = sorted(
        (r["value"], r["is_outlier"])
        for r in mad_outliers(_vals(spark, rows), ["event_type"]).collect()
    )
    approx = sorted(
        (r["value"], r["is_outlier"])
        for r in mad_outliers(_vals(spark, rows), ["event_type"], approx=True).collect()
    )
    assert exact == approx


def test_stream_flag_outliers_against_frozen_baselines(spark, tmp_path):
    import os

    import pandas as pd

    from parqueryd_spark.operators.analytics import flag_with_baselines, mad_baselines
    from parqueryd_spark.streaming.quality import stream_flag_outliers

    ref_rows = [("a", float(v)) for v in range(1, 8)]
    base = mad_baselines(_vals(spark, ref_rows), ["event_type"]).persist()
    # live rows: one wild value, one unknown group (no baseline)
    live = [("a", 4.0), ("a", 50.0), ("zz", 1.0)]
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    pd.DataFrame(live, columns=["event_type", "value"]).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    stream = spark.readStream.schema("event_type string, value double").parquet(stream_in)
    q = stream_flag_outliers(
        stream, base, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    streamed = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "out")).drop("batch").collect())
    )
    batch = sorted(
        map(tuple, flag_with_baselines(_vals(spark, live), base, ["event_type"]).collect())
    )
    assert streamed == batch
    flags = {r[1]: r[-1] for r in streamed}  # value -> is_outlier
    assert flags[50.0] is True and flags[4.0] is False and flags[1.0] is False
    base.unpersist()
