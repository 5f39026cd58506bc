"""Stream-stream interval-overlap join (streaming/interval.py): the native
watermarked join must emit exactly the batch interval_join's pairs on the
same finite inputs, drop NULL/empty intervals, and fail fast on intervals
exceeding the declared max length."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from parqueryd_spark.streaming.interval import stream_interval_join

_T0 = dt.datetime(2026, 1, 1)


def _ts(mins: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=mins)


def _mk_inputs(spark, tmp_path, a_rows, b_rows):
    # write via Spark so timestamps land as TIMESTAMP(MICROS), not pandas'
    # TIMESTAMP(NANOS) (which Spark's reader surfaces as bigint)
    a_dir, b_dir = str(tmp_path / "a_in"), str(tmp_path / "b_in")
    spark.createDataFrame(
        a_rows, "aid long, astart timestamp, aend timestamp"
    ).coalesce(1).write.parquet(a_dir)
    spark.createDataFrame(
        b_rows, "bid long, bstart timestamp, bend timestamp"
    ).coalesce(1).write.parquet(b_dir)
    return a_dir, b_dir


def _run(spark, a_dir, b_dir, sink_name, **kw):
    sa = spark.read.parquet(a_dir).schema
    sb = spark.read.parquet(b_dir).schema
    a = spark.readStream.schema(sa).parquet(a_dir)
    b = spark.readStream.schema(sb).parquet(b_dir)
    joined = stream_interval_join(
        a, b, ("astart", "aend"), ("bstart", "bend"), **kw
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT aid, bid FROM {sink_name}")


def test_stream_equals_batch_interval_join(spark, tmp_path):
    # pseudo-random intervals <= 30 min, plus touch (no overlap), nesting,
    # a NULL bound, and an empty interval — the batch operator's edge cases
    a_rows = [
        (1, _ts(0), _ts(10)),
        (2, _ts(5), _ts(35)),
        (3, _ts(40), _ts(41)),
        (4, _ts(100), _ts(100)),  # empty: matches nothing
        (5, None, _ts(50)),       # NULL bound: dropped
        (6, _ts(55), _ts(56)),
    ]
    b_rows = [
        (10, _ts(8), _ts(12)),
        (11, _ts(10), _ts(20)),   # touches a1 at 10: NOT an overlap
        (12, _ts(34), _ts(42)),
        (13, _ts(41), None),      # NULL bound: dropped
        (14, _ts(54), _ts(84)),
    ]
    a_dir, b_dir = _mk_inputs(spark, tmp_path, a_rows, b_rows)
    got = sorted(
        (r.aid, r.bid)
        for r in _run(
            spark, a_dir, b_dir, "sj1", max_len_a="30 minutes", max_len_b="30 minutes", bucket_width=600.0
        ).collect()
    )

    from parqueryd_spark.operators.relational import interval_join

    batch = interval_join(
        spark.read.parquet(a_dir),
        spark.read.parquet(b_dir),
        ("astart", "aend"),
        ("bstart", "bend"),
        bucket_width=600.0,  # timestamps cast to epoch seconds in the batch op
    )
    want = sorted((r.aid, r.bid) for r in batch.collect())
    assert got == want and got  # same pairs, non-trivially many


def test_overlong_interval_fails_fast(spark, tmp_path):
    a_rows = [(1, _ts(0), _ts(120))]  # 2h > declared 30min max
    b_rows = [(10, _ts(5), _ts(10))]
    a_dir, b_dir = _mk_inputs(spark, tmp_path, a_rows, b_rows)
    with pytest.raises(Exception, match="max length|STREAM_FAILED|assert"):
        _run(
            spark, a_dir, b_dir, "sj2", max_len_a="30 minutes", max_len_b="30 minutes", bucket_width=600.0
        )
