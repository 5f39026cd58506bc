"""Streaming SCD2 maintenance (streaming/history.py): a file-fed change
stream folds into effective-dated history equal to a one-shot init over all
changes, and checkpoint replays cannot corrupt chains."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd

from parqueryd_spark.operators.history import scd2_init
from parqueryd_spark.streaming.history import stream_apply_scd2


def _batch(path, name, rows):
    df = pd.DataFrame(rows, columns=["k", "ts", "tier", "seq"])
    # pandas defaults to ns-precision timestamps, which Spark reads as longs
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(path, name))


def test_stream_scd2_equals_batch_init(spark, tmp_path):
    stream_in = str(tmp_path / "in")
    hist_dir = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    b1 = [
        ("A", dt.datetime(2024, 1, 1), "bronze", 1),
        ("B", dt.datetime(2024, 1, 2), "silver", 2),
    ]
    # b2 restates A's bronze (must not open a version) then golds it,
    # and lands a LATE change for B before its existing version
    b2 = [
        ("A", dt.datetime(2024, 1, 3), "bronze", 3),
        ("A", dt.datetime(2024, 1, 5), "gold", 4),
        ("B", dt.datetime(2024, 1, 1), "bronze", 5),
    ]
    _batch(stream_in, "b1.parquet", b1)
    time.sleep(1.1)
    _batch(stream_in, "b2.parquet", b2)

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    changes = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    )
    q = stream_apply_scd2(
        changes, hist_dir, ckpt, ["k"], "ts",
        compare_cols=["tier"], tiebreak_cols=["seq"],
    )
    q.awaitTermination()

    got = spark.read.parquet(hist_dir)
    want = scd2_init(
        spark.createDataFrame(b1 + b2, "k string, ts timestamp, tier string, seq int"),
        ["k"], "ts", compare_cols=["tier"], tiebreak_cols=["seq"],
    )
    key = lambda r: (r.k, r.eff_from, r.eff_to, r.tier, bool(r.is_current))
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # B's late bronze spliced BEFORE its silver
    b = [r.tier for r in got.filter("k = 'B'").orderBy("eff_from").collect()]
    assert b == ["bronze", "silver"]

    # restart against the same checkpoint with no new files: history unchanged
    q2 = stream_apply_scd2(
        changes, hist_dir, ckpt, ["k"], "ts",
        compare_cols=["tier"], tiebreak_cols=["seq"],
    )
    q2.awaitTermination()
    again = spark.read.parquet(hist_dir)
    assert sorted(map(key, again.collect())) == sorted(map(key, want.collect()))
