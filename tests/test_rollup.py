"""Incremental rollup maintenance: merge algebra + publish integration.

The correctness anchor (incremental == one-shot groupby) is the
events_incremental_rollup registry row, oracle-checked in
test_registry_oracle.py; here we pin the merge algebra itself — associativity,
commutativity, untouched-grain passthrough — and the publish round-trip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from parqueryd_spark.operators.rollup import (
    finalize_rollup,
    incremental_rollup,
    merge_rollups,
    rollup_partials,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), t, v) for i, (d, h, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, event_type string, value double",
    )


ROWS = [
    (1, 0, "click", 1.0),
    (1, 0, "click", 3.0),
    (1, 0, "view", 10.0),
    (1, 1, "click", 5.0),
    (2, 0, "click", 7.0),
    (2, 0, "click", None),  # null value: counts in n_events, not the stats
    (3, 5, "view", 2.0),
]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_order_and_grouping_invariance(spark):
    """split-by-anything then merge == single-pass partials: 3-way vs 2-way
    splits, reversed merge order, and a degenerate empty part."""
    ev = _events(spark, ROWS)
    direct = _canon(finalize_rollup(rollup_partials(ev)))

    a, b, c = (rollup_partials(_events(spark, ROWS[i::3])) for i in range(3))
    empty = rollup_partials(_events(spark, []).limit(0))

    assert _canon(finalize_rollup(merge_rollups(a, b, c))) == direct
    assert _canon(finalize_rollup(merge_rollups(c, a, b))) == direct  # commutes
    assert (
        _canon(finalize_rollup(merge_rollups(merge_rollups(a, b), c))) == direct
    )  # associates: merge of merged state is still mergeable
    assert _canon(finalize_rollup(merge_rollups(a, b, c, empty))) == direct


def test_untouched_grains_pass_through(spark):
    """An increment touching only day 3 must not perturb day 1-2 grains."""
    base = _events(spark, [r for r in ROWS if r[0] < 3])
    inc = _events(spark, [(3, 5, "view", 8.0), (3, 6, "click", 4.0)])
    out = incremental_rollup(base, inc)
    before = {tuple(r) for r in finalize_rollup(rollup_partials(base)).collect()}
    after = {tuple(r) for r in out.collect()}
    untouched = {r for r in before if r[0] < dt.datetime(2024, 1, 3)}
    assert untouched <= after


def test_null_and_single_value_stats(spark):
    ev = _events(spark, ROWS)
    got = {
        (r["window_start"], r["event_type"]): r
        for r in finalize_rollup(rollup_partials(ev)).collect()
    }
    r = got[(dt.datetime(2024, 1, 2, 0), "click")]  # one null + one 7.0
    assert r["n_events"] == 2 and r["sum_value"] == 7.0
    assert r["avg_value"] == 7.0 and r["std_value"] is None  # n<2 non-null => NULL std
    r = got[(dt.datetime(2024, 1, 1, 0), "click")]
    assert r["n_events"] == 2 and r["avg_value"] == 2.0 and abs(r["std_value"] - 2 ** 0.5) < 1e-9


def test_rollup_publish_roundtrip(spark, tmp_path):
    """Maintained rollup published atomically; a reader sees the merged state."""
    from parqueryd_spark.sources.sinks import atomic_publish

    ds = str(tmp_path / "rollup_ds")
    base = _events(spark, ROWS[:4])
    atomic_publish(rollup_partials(base), ds)
    stored = spark.read.parquet(ds)
    inc = rollup_partials(_events(spark, ROWS[4:]))
    atomic_publish(merge_rollups(stored, inc), ds)
    final = finalize_rollup(spark.read.parquet(ds))
    direct = finalize_rollup(rollup_partials(_events(spark, ROWS)))
    assert _canon(final) == _canon(direct)
