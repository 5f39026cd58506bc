"""Misra-Gries heavy hitters: the undercount bound must hold against exact
counts, the sketch must recover the exact top-k on a zipfian stream, and the
capacity knob must control the bound. (Registry row text_heavy_hitter_tokens
is rows-only; this is its correctness story.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.sketches import heavy_hitters


def _zipf(spark, n_keys=200, scale=1000, parts=16):
    rows = [(i,) for i in range(1, n_keys) for _ in range(scale // i)]
    return spark.createDataFrame(rows, "k long").repartition(parts)


def test_bound_holds_and_topk_exact_on_zipf(spark):
    df = _zipf(spark)
    true = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    hh = heavy_hitters(df, "k", k=10, capacity=32).collect()
    for r in hh:
        assert r.est_count <= true[r.k] <= r.est_count + r.max_undercount, r
    exact_top = [
        r.k for r in df.groupBy("k").count().orderBy(F.desc("count"), "k").limit(10).collect()
    ]
    assert [r.k for r in hh] == exact_top


def test_capacity_controls_error(spark):
    df = _zipf(spark)
    loose = heavy_hitters(df, "k", k=5, capacity=8).collect()[0].max_undercount
    tight = heavy_hitters(df, "k", k=5, capacity=256).collect()[0].max_undercount
    assert tight <= loose
    # capacity >= number of distinct keys => no evictions, exact counts
    exact = heavy_hitters(df, "k", k=5, capacity=4096).collect()
    true = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert exact[0].max_undercount == 0
    assert all(r.est_count == true[r.k] for r in exact)


def test_null_keys_ignored_and_string_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), (None,), (None,)], "s string"
    )
    hh = heavy_hitters(df, "s", k=3, capacity=16).collect()
    assert [(r.s, r.est_count) for r in hh] == [("a", 2), ("b", 1)]


def test_guarantee_above_phi_fraction(spark):
    """Any key with frequency > n/(capacity+1) summed per partition must
    surface among the candidates — the MG guarantee, checked with a hot key
    buried in uniform noise."""
    rows = [(999,)] * 400 + [(i % 97,) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long").repartition(8)
    hh = heavy_hitters(df, "k", k=5, capacity=64).collect()
    assert 999 in {r.k for r in hh}
