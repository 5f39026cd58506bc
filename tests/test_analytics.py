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
