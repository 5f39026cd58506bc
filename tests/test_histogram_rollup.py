"""Mergeable histogram-quantile rollup state (operators/rollup.py): split
+merge equals one-shot exactly, quantile estimates are bin-width-bounded,
and out-of-range values clamp into edge bins."""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.rollup import (
    histogram_partials,
    histogram_quantiles,
    merge_histograms,
)
from parqueryd_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE

LO, HI, BINS = 0.0, 330.0, 66  # covers the fixture's value range [0.03, 327.5]


def _hist_rows(df):
    return {
        (r.window_start, r.event_type, r.bin): r.n for r in df.collect()
    }


def test_merge_split_equals_oneshot(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    full = histogram_partials(ev, LO, HI, BINS)
    a = histogram_partials(ev.filter(F.col("event_id") % 2 == 0), LO, HI, BINS)
    b = histogram_partials(ev.filter(F.col("event_id") % 2 == 1), LO, HI, BINS)
    assert _hist_rows(merge_histograms(a, b)) == _hist_rows(full)


def test_quantile_estimates_within_bin_of_order_statistic(spark):
    """The documented guarantee: the estimate lies within one bin width of
    the ceil(n*p)-th order statistic of its group (NOT of the interpolating
    SQL percentile — sparse groups make those differ by inter-sample gaps)."""
    import math

    ev = load_table(spark, SF_SMOKE, "events")
    hist = histogram_partials(ev, LO, HI, BINS, grain="1 day")
    est = histogram_quantiles(hist, [0.5, 0.9], LO, HI, BINS)
    groups: dict = {}
    for r in ev.select(
        F.window("ts", "1 day")["start"].alias("w"), "event_type", "value"
    ).collect():
        groups.setdefault((r.w, r.event_type), []).append(r.value)
    for vals in groups.values():
        vals.sort()
    width = (HI - LO) / BINS
    checked = 0
    for r in est.collect():
        vals = groups[(r.window_start, r.event_type)]
        want = vals[max(0, math.ceil(len(vals) * r.prob) - 1)]
        assert abs(r.quantile_est - want) <= width, (r, want)
        checked += 1
    assert checked == 2 * len(groups)


def test_out_of_range_values_clamp_to_edge_bins(spark):
    from datetime import datetime

    width = (HI - LO) / BINS
    mid = LO + width * (BINS // 2) + 0.1
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), "a", -5.0),   # below lo -> bin 0
            (2, datetime(2024, 1, 1), "a", 999.0),  # above hi -> last bin
            (3, datetime(2024, 1, 1), "a", mid),    # mid-range
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    rows = {r.bin: r.n for r in histogram_partials(df, LO, HI, BINS).collect()}
    assert rows[0] == 1 and rows[BINS - 1] == 1 and rows[BINS // 2] == 1


def test_streaming_histogram_matches_batch(spark, tmp_path):
    """availableNow micro-batches of histogram state merge to exactly the
    one-shot batch answer (idempotent per-batch partitions + merge-on-read)."""
    import os

    from parqueryd_spark.streaming.rollup import (
        read_histogram_quantiles,
        stream_maintain_histogram,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = os.path.join(str(tmp_path), "src")
    ev.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    hd = os.path.join(str(tmp_path), "hist")
    q = stream_maintain_histogram(
        stream, hd, os.path.join(str(tmp_path), "ckpt"), LO, HI, BINS, grain="1 day"
    )
    q.awaitTermination()
    assert len([d for d in os.listdir(hd) if d.startswith("batch=")]) >= 2

    streamed = {
        (r.window_start, r.event_type, r.prob): r.quantile_est
        for r in read_histogram_quantiles(spark, hd, [0.5, 0.9], LO, HI, BINS).collect()
    }
    batch = {
        (r.window_start, r.event_type, r.prob): r.quantile_est
        for r in histogram_quantiles(
            histogram_partials(ev, LO, HI, BINS, grain="1 day"), [0.5, 0.9], LO, HI, BINS
        ).collect()
    }
    assert streamed == batch
