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
