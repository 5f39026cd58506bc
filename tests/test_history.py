"""SCD2 history (operators/history.py): version chains from a change log,
no-change collapse, point-in-time reads, and incremental apply ≡ full
rebuild (including late-arriving changes splicing mid-chain)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parqueryd_spark.operators.history import (
    scd2_apply,
    scd2_as_of,
    scd2_current,
    scd2_init,
)


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture()
def log(spark):
    rows = [
        # key A: bronze -> bronze (restated, must collapse) -> gold
        ("A", _ts(1), "bronze", 1),
        ("A", _ts(2), "bronze", 2),
        ("A", _ts(5), "gold", 3),
        # key B: single version
        ("B", _ts(3), "silver", 4),
        # key C: null attribute restated, then set
        ("C", _ts(1), None, 5),
        ("C", _ts(2), None, 6),
        ("C", _ts(4), "bronze", 7),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, tier string, seq int")


def _chains(hist):
    return sorted(
        (r.k, r.eff_from, r.eff_to, r.tier, r.is_current) for r in hist.collect()
    )


def test_init_builds_collapsed_chains(log):
    hist = scd2_init(log, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    got = _chains(hist)
    assert got == sorted(
        [
            ("A", _ts(1), _ts(5), "bronze", False),
            ("A", _ts(5), None, "gold", True),
            ("B", _ts(3), None, "silver", True),
            ("C", _ts(1), _ts(4), None, False),
            ("C", _ts(4), None, "bronze", True),
        ]
    )
    # intervals tile: every key has exactly one current row
    cur = scd2_current(hist).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_as_of_snapshots(log):
    hist = scd2_init(log, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    at = {r.k: r.tier for r in scd2_as_of(hist, _ts(3)).collect()}
    assert at == {"A": "bronze", "B": "silver", "C": None}
    at5 = {r.k: r.tier for r in scd2_as_of(hist, _ts(5)).collect()}
    assert at5["A"] == "gold"  # eff_from inclusive
    assert {r.k for r in scd2_as_of(hist, dt.datetime(2023, 12, 31)).collect()} == set()


def test_without_compare_every_row_versions(log):
    hist = scd2_init(log, ["k"], "ts", tiebreak_cols=["seq"])
    assert hist.count() == log.count()


def test_apply_equals_full_rebuild(spark, log):
    """Incremental apply over a split change feed — including a LATE change
    that lands between existing versions — must equal one-shot init over
    the union."""
    late = spark.createDataFrame(
        [("A", _ts(3), "silver", 10), ("D", _ts(2), "gold", 11)],
        "k string, ts timestamp, tier string, seq int",
    )
    hist0 = scd2_init(log, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    applied = scd2_apply(
        hist0, late, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"]
    )
    rebuilt = scd2_init(
        log.unionByName(late), ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"]
    )
    assert _chains(applied) == _chains(rebuilt)
    # the late silver spliced in: A is now bronze -> silver -> gold
    a = [r.tier for r in applied.filter("k = 'A'").orderBy("eff_from").collect()]
    assert a == ["bronze", "silver", "gold"]
    # untouched keys' rows really were untouched (same chain as before)
    assert _chains(applied.filter("k in ('B', 'C')")) == _chains(
        hist0.filter("k in ('B', 'C')")
    )


def test_reserved_columns_rejected(spark):
    df = spark.createDataFrame([("A", _ts(1), 1)], "k string, ts timestamp, eff_from int")
    with pytest.raises(ValueError, match="reserves"):
        scd2_init(df, ["k"], "ts")


def test_apply_only_shuffles_affected_keys(spark, log):
    """Plan shape: the untouched side is an anti join, not a rewrite — no
    window over keys absent from the batch."""
    late = spark.createDataFrame([("A", _ts(9), "x", 12)], "k string, ts timestamp, tier string, seq int")
    hist0 = scd2_init(log, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    applied = scd2_apply(hist0, late, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    plan = applied._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_apply_is_idempotent_under_replay(spark, log):
    """At-least-once contract: re-applying a batch the history already
    absorbed must be a no-op — the streaming face replays batches after a
    crash, and a replay that re-opened versions would corrupt chains."""
    late = spark.createDataFrame(
        [("A", _ts(3), "silver", 10)], "k string, ts timestamp, tier string, seq int"
    )
    hist0 = scd2_init(log, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    once = scd2_apply(hist0, late, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    twice = scd2_apply(once, late, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    assert _chains(twice) == _chains(once)


def test_apply_restatement_prefers_incoming_batch(spark):
    """ADVICE r8: when an incoming change shares (key, ts, tiebreak) identity
    with a replayed history version but restates attribute values, the
    incoming row must win deterministically (not dropDuplicates roulette)."""
    from parqueryd_spark.operators.history import scd2_apply, scd2_current, scd2_init

    log = spark.createDataFrame(
        [("A", _ts(1), "bronze", 1), ("A", _ts(5), "silver", 2)],
        "k string, ts timestamp, tier string, seq int",
    )
    hist0 = scd2_init(log, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"])
    restate = spark.createDataFrame(
        [("A", _ts(5), "gold", 2)], "k string, ts timestamp, tier string, seq int"
    )
    for _ in range(3):  # stable across runs, not one lucky draw
        out = scd2_apply(
            hist0, restate, ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"]
        )
        cur = scd2_current(out).collect()
        assert [(r.k, r.tier) for r in cur] == [("A", "gold")]
        assert out.count() == 2
