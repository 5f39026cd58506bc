"""Structured Streaming parity tests: each streaming operator drained with an
availableNow trigger must equal its batch twin over the same events data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parqueryd_spark.queries.events import events_sliding_window, events_tumbling_window
from parqueryd_spark.streaming.stateful import stream_running_totals
from parqueryd_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_stream(spark):
    import os

    return read_events_stream(spark, os.path.join(SF_SMOKE, "events.parquet"))


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf.reindex(cols, axis=1)
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).astype("datetime64[ns]")
    return out.sort_values(cols).reset_index(drop=True)


def test_stream_tumbling_matches_batch(spark, events_stream):
    got = _sorted(run_stream_to_memory(stream_tumbling_counts(events_stream), "t_tumble", output_mode="complete").toPandas())
    want = _sorted(events_tumbling_window(spark, SF_SMOKE).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_sliding_matches_batch(spark, events_stream):
    got = _sorted(run_stream_to_memory(stream_sliding_counts(events_stream), "t_slide", output_mode="complete").toPandas())
    want = _sorted(events_sliding_window(spark, SF_SMOKE).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_session_windows(spark, events_stream):
    out = run_stream_to_memory(stream_session_windows(events_stream), "t_sess", output_mode="complete").toPandas()
    assert len(out) > 0
    # session invariants: end >= start, no zero-event sessions
    assert (out["session_end"] >= out["session_start"]).all()
    assert (out["n_events"] >= 1).all()
    # per-user totals must match the raw event counts
    import os

    ev = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    raw = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    per_user = out.groupby("user_id")["n_events"].sum()
    for uid, n in per_user.items():
        assert n == raw[uid]


def test_stream_stream_join_matches_batch(spark, events_stream):
    from parqueryd_spark.streaming.windows import stream_stream_join

    from parqueryd_spark.sources.parquet import load_table

    purchases = events_stream.filter(F.col("event_type") == "purchase")
    clicks = events_stream.filter(F.col("event_type") == "click")
    got = _sorted(
        run_stream_to_memory(
            stream_stream_join(purchases, clicks), "t_ssjoin", output_mode="append"
        ).toPandas()
    )
    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    want = _sorted(
        p.join(
            c,
            (p.user_id == c.c_user_id)
            & (c.click_ts <= p.purchase_ts)
            & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 3600 SECONDS")),
        )
        .select("purchase_id", "user_id", "purchase_ts", "click_ts", "click_value")
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_stateful_running_totals(spark, events_stream):
    out = run_stream_to_memory(
        stream_running_totals(events_stream), "t_state", output_mode="update"
    ).toPandas()
    assert len(out) > 0
    import os

    ev = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    want = ev.groupBy("user_id").agg({"value": "sum", "*": "count"}).toPandas()
    want_totals = want.set_index("user_id")["sum(value)"]
    # final state per user (availableNow => last emission is the total)
    final = out.groupby("user_id").last()
    for uid, row in final.iterrows():
        assert abs(row["total_value"] - want_totals[uid]) < 1e-6


def test_stream_publishes_atomic_snapshots(spark, events_stream, tmp_path):
    """foreachBatch + atomic_publish: the drained stream's published snapshot
    must equal the batch twin, with no partially-visible generation dirs."""
    import os

    from parqueryd_spark.streaming.windows import run_stream_publish_snapshots

    target = str(tmp_path / "snapshot")
    run_stream_publish_snapshots(
        stream_tumbling_counts(events_stream), target, str(tmp_path / "ckpt")
    )
    got = _sorted(spark.read.parquet(target).toPandas())
    want = _sorted(events_tumbling_window(spark, SF_SMOKE).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith((".incoming_", ".old_"))]
    assert leftovers == []
