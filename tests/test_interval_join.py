"""Bucketized interval-overlap join (operators/relational.py interval_join):
equals the naive theta join exactly (no duplicate pairs from multi-bucket
co-occurrence, no missed pairs at bucket edges), no cartesian in the plan,
and the long-interval guard fails fast."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parqueryd_spark.operators.relational import interval_join


@pytest.fixture(scope="module")
def sides(spark):
    """Pseudo-random half-open intervals on both sides, lengths straddling
    the bucket width (some spill over several buckets, some sit inside one),
    plus exact-touch cases (end == start: NOT an overlap, half-open)."""
    a = spark.range(300).select(
        F.col("id").alias("aid"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double")).alias("astart"),
    ).withColumn(
        "aend", F.col("astart") + 1 + F.pmod(F.xxhash64("aid", F.lit(1)), F.lit(40))
    )
    b = spark.range(300).select(
        F.col("id").alias("bid"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("double")).alias("bstart"),
    ).withColumn(
        "bend", F.col("bstart") + 1 + F.pmod(F.xxhash64("bid", F.lit(3)), F.lit(40))
    )
    touch = spark.createDataFrame([(9001, 100.0, 110.0)], "aid long, astart double, aend double")
    touch_b = spark.createDataFrame([(9002, 110.0, 120.0)], "bid long, bstart double, bend double")
    return a.unionByName(touch), b.unionByName(touch_b)


@pytest.mark.parametrize("width", [7.0, 16.0, 64.0])
def test_equals_naive_theta_join(spark, sides, width):
    a, b = sides
    got = sorted(
        (r.aid, r.bid)
        for r in interval_join(a, b, ("astart", "aend"), ("bstart", "bend"), width).collect()
    )
    want = sorted(
        (r.aid, r.bid)
        for r in a.join(
            b, (F.col("astart") < F.col("bend")) & (F.col("bstart") < F.col("aend"))
        ).collect()
    )
    assert got == want and len(want) > 100
    # half-open: the exact-touch pair must be absent
    assert (9001, 9002) not in got


def test_no_cartesian_in_plan(sides):
    a, b = sides
    plan = interval_join(
        a, b, ("astart", "aend"), ("bstart", "bend"), 16.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_timestamp_intervals(spark):
    base = dt.datetime(2024, 1, 1)
    a = spark.createDataFrame(
        [(1, base, base + dt.timedelta(hours=5))], "aid long, astart timestamp, aend timestamp"
    )
    b = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=4), base + dt.timedelta(hours=9)),
         (2, base + dt.timedelta(hours=5), base + dt.timedelta(hours=6))],
        "bid long, bstart timestamp, bend timestamp",
    )
    got = sorted(
        r.bid
        for r in interval_join(
            a, b, ("astart", "aend"), ("bstart", "bend"), 3600.0
        ).collect()
    )
    assert got == [1]  # bid=2 starts exactly at a's (exclusive) end


def test_guards(spark, sides):
    a, b = sides
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(a, a, ("astart", "aend"), ("astart", "aend"), 8.0)
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(a, b, ("astart", "aend"), ("bstart", "bend"), 0)
    wide = spark.createDataFrame([(1, 0.0, 1e9)], "aid long, astart double, aend double")
    with pytest.raises(Exception, match="spans"):
        interval_join(
            wide, b, ("astart", "aend"), ("bstart", "bend"), 1.0,
            max_buckets_per_interval=100,
        ).collect()


def test_band_join_equals_naive(spark):
    """band_join: |x - y| <= delta (+ optional equi keys) must equal the
    naive theta join — one-sided explode means each pair meets exactly once,
    so there is no dedup step to get wrong."""
    from parqueryd_spark.operators.relational import band_join

    a = spark.range(500).select(
        F.col("id").alias("aid"),
        F.pmod(F.xxhash64("id"), F.lit(200)).alias("ak"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10000)).cast("double") / 10).alias("x"),
    )
    b = spark.range(500).select(
        F.col("id").alias("bid"),
        F.pmod(F.xxhash64("id", F.lit(8)), F.lit(200)).alias("bk"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)).cast("double") / 10).alias("y"),
    )
    for delta, width in ((5.0, None), (5.0, 20.0), (0.0, 1.0)):
        got = sorted(
            (r.aid, r.bid)
            for r in band_join(a, b, "x", "y", delta, bucket_width=width).collect()
        )
        want = sorted(
            (r.aid, r.bid)
            for r in a.join(b, F.abs(F.col("x") - F.col("y")) <= delta).collect()
        )
        assert got == want, (delta, width)
    # with equi keys riding the same shuffle
    got = sorted(
        (r.aid, r.bid)
        for r in band_join(a, b, "x", "y", 25.0, equi_keys=[("ak", "bk")]).collect()
    )
    want = sorted(
        (r.aid, r.bid)
        for r in a.join(
            b, (F.col("ak") == F.col("bk")) & (F.abs(F.col("x") - F.col("y")) <= 25.0)
        ).collect()
    )
    assert got == want and len(want) > 0


def test_band_join_guards(spark):
    from parqueryd_spark.operators.relational import band_join

    a = spark.range(3).select(F.col("id").alias("aid"), F.col("id").cast("double").alias("x"))
    b = spark.range(3).select(F.col("id").alias("bid"), F.col("id").cast("double").alias("y"))
    with pytest.raises(ValueError, match="bucket_width"):
        band_join(a, b, "x", "y", 10.0, bucket_width=5.0)
    with pytest.raises(ValueError, match="delta"):
        band_join(a, b, "x", "y", -1.0)
    plan = band_join(a, b, "x", "y", 1.0)._jdf.queryExecution().optimizedPlan().toString()
    assert "Cartesian" not in plan


def test_null_bounds_are_dropped_not_crashed(spark):
    """ADVICE r8: Catalyst's And evaluates the right side when the left is
    NULL, so the long-interval assert_true guard used to raise on rows with
    NULL start/end instead of letting the bounds filter drop them."""
    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, None, 10.0), (3, 5.0, None), (4, None, None)],
        "aid long, astart double, aend double",
    )
    b = spark.createDataFrame(
        [(10, 5.0, 15.0), (11, None, 20.0)], "bid long, bstart double, bend double"
    )
    got = sorted(
        (r.aid, r.bid)
        for r in interval_join(a, b, ("astart", "aend"), ("bstart", "bend"), 8.0).collect()
    )
    assert got == [(1, 10)]
