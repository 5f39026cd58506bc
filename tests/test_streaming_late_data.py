"""Watermark semantics: events arriving later than the watermark delay are
dropped from windowed aggregation state — the property that bounds streaming
state at scale (without it, state grows with stream length)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parqueryd_spark.streaming.windows import read_events_stream, stream_tumbling_counts


def _write_events(path: str, rows: list[tuple[int, str, int, str, float, str]]) -> None:
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
    pdf.to_parquet(path)


def test_late_events_dropped_by_watermark(spark, tmp_path):
    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    # batch 1: two on-time events in [00:00, 01:00) and one far ahead at 10:00
    # (advances the watermark to 09:00 with a 1-hour delay)
    _write_events(
        os.path.join(d, "f1.parquet"),
        [
            (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:20:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        ],
    )
    checkpoint = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run(name: str) -> pd.DataFrame:
        events = read_events_stream(spark, d)
        agg = stream_tumbling_counts(events, watermark="1 hour")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).toPandas()

    # run 1 processes f1 only (f2 not written yet); watermark advances to 09:00
    run("late_run1")
    time.sleep(1.1)
    _write_events(
        os.path.join(d, "f2.parquet"),
        [(4, "2024-01-01 00:30:00", 1, "click", 1.0, "{}")],
    )
    # run 2 restores watermark from the checkpoint; the 00:30 event is > 1 hour
    # late and must be dropped before it touches window state
    out = run("late_run2")
    first_window = out[out["window_start"] == pd.Timestamp("2024-01-01 00:00:00")]
    assert len(first_window) == 1
    # on-time events only: the late event (id 4) was dropped, so 2 not 3
    assert int(first_window["n_events"].iloc[0]) == 2
    # batch semantics would have counted all 3 — the difference IS the drop
    batch = (
        spark.read.parquet(os.path.join(d, "f1.parquet"), os.path.join(d, "f2.parquet"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))  # nanosAsLong read
        .filter(F.col("ts") < "2024-01-01 01:00:00")
        .count()
    )
    assert batch == 3


def test_read_events_stream_starts_on_empty_dir(spark, tmp_path):
    """Start-stream-then-land-files: a directory that is EMPTY at start-up
    can't be schema-probed, so read_events_stream falls back to the known
    events schema instead of throwing 'unable to infer schema' — the stream
    must start (and drain zero rows) before any file exists."""
    d = str(tmp_path / "empty_in")
    os.makedirs(d)
    events = read_events_stream(spark, d)
    assert events.isStreaming
    assert [f.name for f in events.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    q = (
        stream_tumbling_counts(events)
        .writeStream.format("memory")
        .queryName("empty_start")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("empty_start").count() == 0
