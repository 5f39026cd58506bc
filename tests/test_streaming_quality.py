"""Streaming quality monitor (streaming/quality.py): per-batch reports land
in batch partitions; fail_fast stops the stream on a failing batch."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from parqueryd_spark.operators.quality import check_not_null, check_unique
from parqueryd_spark.streaming.quality import (
    read_quality_metrics,
    stream_quality_monitor,
)


def _write(path, rows):
    pd.DataFrame(rows, columns=["k", "v"]).to_parquet(path)


def _checks(batch):
    return [check_unique(batch, ["k"]), check_not_null(batch, ["k", "v"])]


def test_monitor_reports_per_batch(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _write(os.path.join(feed, "b1.parquet"), [(1, "a"), (2, "b")])   # clean
    time.sleep(1.1)
    _write(os.path.join(feed, "b2.parquet"), [(3, "c"), (3, None)])  # dup + null
    schema = spark.read.parquet(os.path.join(feed, "b1.parquet")).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_quality_monitor(
        stream, str(tmp_path / "metrics"), str(tmp_path / "ckpt"), _checks
    )
    q.awaitTermination()
    metrics = read_quality_metrics(spark, str(tmp_path / "metrics"))
    rows = {(r.batch, r.check): (r.violations, r.passed) for r in metrics.collect()}
    assert rows[(0, "unique(k)")] == (0, True)
    assert rows[(0, "not_null(k,v)")] == (0, True)
    assert rows[(1, "unique(k)")] == (1, False)
    assert rows[(1, "not_null(k,v)")] == (1, False)
    assert all(r.n_batch_rows == 2 for r in metrics.collect())


def test_monitor_fail_fast_stops_stream(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _write(os.path.join(feed, "bad.parquet"), [(7, "x"), (7, "y")])
    schema = spark.read.parquet(os.path.join(feed, "bad.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(feed)
    q = stream_quality_monitor(
        stream,
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
        _checks,
        fail_fast=True,
    )
    with pytest.raises(Exception, match="quality gate failed"):
        q.awaitTermination()
    # the failing batch's report was still written for diagnosis
    metrics = read_quality_metrics(spark, str(tmp_path / "metrics"))
    assert any(not r.passed for r in metrics.collect())


def test_stream_calibrate_scores_matches_batch_and_stays_frozen(spark, tmp_path):
    """stream_calibrate_scores: micro-batches served against a published CDF
    are row-for-row the batch calibration_score answer, and a skewed later
    batch cannot move earlier batches' calib values (frozen-gate contract).
    Replays are idempotent (batch=<id> overwrite)."""
    from parqueryd_spark.operators.quality import calibration_cdf, calibration_score
    from parqueryd_spark.streaming.quality import stream_calibrate_scores

    ref = calibration_cdf(
        spark.createDataFrame(
            [(i, "a", s) for i, s in enumerate([10, 20, 20, 40])]
            + [(9, "b", 100)],
            "id long, g string, s long",
        ),
        "g",
        "s",
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    b1 = [(1, "a", 5), (2, "a", 20), (3, "b", 150)]
    b2 = [(4, "a", 1000), (5, "a", 1000), (6, "b", 50)]  # skewed flood
    pd.DataFrame(b1, columns=["doc", "g", "s"]).to_parquet(os.path.join(feed, "b1.parquet"))
    time.sleep(1.1)
    pd.DataFrame(b2, columns=["doc", "g", "s"]).to_parquet(os.path.join(feed, "b2.parquet"))
    schema = spark.read.parquet(os.path.join(feed, "b1.parquet")).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_calibrate_scores(
        stream, ref, str(tmp_path / "scores"), str(tmp_path / "ckpt"),
        "g", "s", "doc",
    )
    q.awaitTermination()

    got = {
        r.doc: r.calib
        for r in spark.read.parquet(str(tmp_path / "scores")).collect()
    }
    batch_all = spark.createDataFrame(b1 + b2, "doc long, g string, s long")
    want = {
        r.doc: r.calib
        for r in calibration_score(ref, batch_all, "g", "s", "doc").collect()
    }
    assert got == want
    # frozen semantics: the flood batch didn't move batch-1 values
    assert got[1] == 0.0 and got[2] == 0.75 and got[3] == 1.0
    assert got[4] == got[5] == 1.0 and got[6] == 0.0
