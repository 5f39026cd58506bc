"""Streaming deduplication: dropDuplicatesWithinWatermark removes repeated
event_ids arriving within the watermark horizon — the streaming twin of
exact dedup, with state bounded by the watermark instead of growing forever."""

from __future__ import annotations

import os
import time

import pandas as pd

from parqueryd_spark.streaming.windows import read_events_stream


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
    pdf.to_parquet(path)


def test_stream_drop_duplicates_within_watermark(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(
        os.path.join(d, "f1.parquet"),
        [
            (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
            (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),  # exact dup
            (2, "2024-01-01 00:20:00", 1, "click", 1.0, "{}"),
        ],
    )
    time.sleep(1.1)
    _write(
        os.path.join(d, "f2.parquet"),
        [
            (2, "2024-01-01 00:21:00", 1, "click", 1.0, "{}"),  # dup id, later ts
            (3, "2024-01-01 00:30:00", 1, "click", 1.0, "{}"),
        ],
    )
    events = read_events_stream(spark, d, max_files_per_trigger=1)
    deduped = events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_dedup_stream").toPandas()
    assert sorted(out["event_id"]) == [1, 2, 3]  # one row per id across batches
