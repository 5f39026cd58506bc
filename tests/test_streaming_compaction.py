"""r15: compaction for the COUNT-TABLE streaming-state families (VERDICT r14
item #1). r14 closed the merge-on-read growth axis for the KMV/CM/MG sketch
states (streaming/rollup.py compact_*_state, pinned in
test_streaming_rollup.py); the same ``batch=<id>`` accumulation existed,
uncompacted, for the histogram/HLL rollup state, the LM count table, and the
NB classifier partials. These tests pin the identical contract for each:
folding history into one ``batch=-1`` generation leaves EVERY served answer
identical (the states are linear or idempotent-mergeable, and the fold is
exactly what the read path performs per query), shrinks the stored row/file
count, preserves the model-parameter ``_meta`` through the atomic swap
(LM/NB), and composes with continued maintenance."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd


def _write_event_batches(stream_in: str):
    os.makedirs(stream_in)
    # user 1 clicks in BOTH batches so HLL/distinct state is genuinely
    # cross-batch; values span both event types in both batches so the
    # histogram state has multiple rows per (grain, key) to fold
    rows1 = [(1, dt.datetime(2024, 1, 1, 0, 5), "click", 1.0),
             (2, dt.datetime(2024, 1, 1, 0, 9), "click", 7.0),
             (3, dt.datetime(2024, 1, 1, 1, 0), "view", 2.5)]
    rows2 = [(1, dt.datetime(2024, 1, 2, 0, 5), "click", 9.0),
             (4, dt.datetime(2024, 1, 2, 2, 0), "view", 4.0),
             (5, dt.datetime(2024, 1, 1, 0, 30), "click", 3.0)]  # late row, day-1 grain

    def _w(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(os.path.join(stream_in, name))

    _w("b1.parquet", rows1)
    time.sleep(1.1)
    _w("b2.parquet", rows2)
    return rows1 + rows2


def test_histogram_and_hll_compaction_preserve_answers(spark, tmp_path):
    from parqueryd_spark.streaming.rollup import (
        compact_histogram_state,
        compact_hll_state,
        read_histogram_quantiles,
        read_hll_distinct,
        stream_maintain_histogram,
        stream_maintain_hll,
    )

    stream_in = str(tmp_path / "in")
    _write_event_batches(stream_in)
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )

    lo, hi, bins = 0.0, 10.0, 8

    # ---- histogram: bin counts are linear, quantile answers must be identical
    hd = str(tmp_path / "hist")
    stream_maintain_histogram(
        src(), hd, str(tmp_path / "ck1"), lo, hi, bins, grain="1 day"
    ).awaitTermination()
    before = sorted(
        map(tuple, read_histogram_quantiles(spark, hd, [0.5, 0.9], lo, hi, bins).collect())
    )
    rows_before = spark.read.parquet(hd).count()
    n_batch_dirs = len([d for d in os.listdir(hd) if d.startswith("batch=")])
    assert n_batch_dirs >= 2  # there is real history to fold
    rows_after = compact_histogram_state(spark, hd)
    after = sorted(
        map(tuple, read_histogram_quantiles(spark, hd, [0.5, 0.9], lo, hi, bins).collect())
    )
    assert after == before
    assert rows_after <= rows_before
    assert [d for d in os.listdir(hd) if d.startswith("batch=")] == ["batch=-1"]

    # ---- HLL: register-wise-max union, estimates + n_rows identical
    hld = str(tmp_path / "hll")
    stream_maintain_hll(src(), hld, str(tmp_path / "ck2")).awaitTermination()
    hll_before = sorted(
        (r.event_type, r.n_rows, r.n_distinct)
        for r in read_hll_distinct(spark, hld).collect()
    )
    hll_rows_before = spark.read.parquet(hld).count()
    hll_rows_after = compact_hll_state(spark, hld)
    hll_after = sorted(
        (r.event_type, r.n_rows, r.n_distinct)
        for r in read_hll_distinct(spark, hld).collect()
    )
    assert hll_after == hll_before
    assert hll_rows_after < hll_rows_before  # 2 batches x 2 keys -> 2 rows
    assert hll_rows_after == 2

    # ---- compaction composes with continued maintenance: a third file lands
    # beside batch=-1 and merges in (cross-batch duplicate user must STILL
    # not double-count — idempotent union across the compacted generation)
    extra = [(1, dt.datetime(2024, 1, 3, 0, 5), "click", 5.0),
             (9, dt.datetime(2024, 1, 3, 0, 6), "click", 5.0)]
    pdf = pd.DataFrame(extra, columns=["user_id", "ts", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(stream_in, "b3.parquet"))
    stream_maintain_hll(src(), hld, str(tmp_path / "ck2")).awaitTermination()
    grown = {r.event_type: (r.n_rows, r.n_distinct)
             for r in read_hll_distinct(spark, hld).collect()}
    assert grown["click"] == (6, 4)  # users {1,2,5,9}; user 1 never double-counts
    assert grown["view"] == (2, 2)


def test_lm_compaction_preserves_scores_and_meta(spark, tmp_path):
    from parqueryd_spark.operators.lm import kn_score, lm_score
    from parqueryd_spark.streaming.lm import (
        compact_lm_state,
        read_lm,
        stream_maintain_lm,
    )

    docs = [(1, "a b a b c"), (2, "b c d a"), (3, "a b c d e")]
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    pd.DataFrame(docs[:2], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame(docs[2:], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = "doc_id bigint, text string"
    lm_dir, ckpt = str(tmp_path / "lm"), str(tmp_path / "ck")

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )

    # maintained at a NON-default order so meta preservation is observable:
    # losing _meta would make read_lm fall back to n=2 and raise on the
    # stored 3-token grams
    stream_maintain_lm(src(), lm_dir, ckpt, n=3, k=0.25).awaitTermination()

    doc_df = spark.createDataFrame(docs, schema)
    served = read_lm(spark, lm_dir)
    before_add = sorted(map(tuple, lm_score(doc_df, "doc_id", served).collect()))
    before_kn = sorted(map(tuple, kn_score(doc_df, "doc_id", served).collect()))
    rows_before = spark.read.parquet(lm_dir).count()

    rows_after = compact_lm_state(spark, lm_dir)
    assert [d for d in os.listdir(lm_dir) if d.startswith("batch=")] == ["batch=-1"]
    assert rows_after <= rows_before

    # _meta survived the swap INSIDE the generation: read_lm with no
    # explicit (k, n) still serves order 3 at k=0.25, scores identical
    served2 = read_lm(spark, lm_dir)
    assert (served2.k, served2.n) == (0.25, 3)
    assert sorted(map(tuple, lm_score(doc_df, "doc_id", served2).collect())) == before_add
    assert sorted(map(tuple, kn_score(doc_df, "doc_id", served2).collect())) == before_kn

    # continued maintenance: a post-compaction increment lands beside
    # batch=-1, still at the guarded (k, n); counts keep adding linearly
    pd.DataFrame([(4, "a b c a b c")], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b3.parquet")
    )
    stream_maintain_lm(src(), lm_dir, ckpt, n=3, k=0.25).awaitTermination()
    grown = {r["gram"]: r["c"] for r in read_lm(spark, lm_dir).bigrams.collect()}
    base = {r["gram"]: r["c"] for r in served2.bigrams.collect()}
    assert grown["a b c"] == base["a b c"] + 2  # doc 4 adds two 'a b c' grams


def test_nb_compaction_preserves_model_and_meta(spark, tmp_path):
    import pytest

    from parqueryd_spark.streaming.classify import (
        compact_nb_state,
        read_nb_model,
        stream_maintain_nb,
    )

    rows = [(i, "alpha beta beta", "A") for i in range(10)] + [
        (i, "delta epsilon", "B") for i in range(10, 22)
    ]
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf.iloc[:8].to_parquet(os.path.join(stream_in, "b1.parquet"))
    pdf.iloc[8:].to_parquet(os.path.join(stream_in, "b2.parquet"))
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    nb_dir, ckpt = str(tmp_path / "nb"), str(tmp_path / "ck")

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )

    stream_maintain_nb(src(), nb_dir, ckpt, "lang", n_buckets=64, salt="s1").awaitTermination()

    before = sorted(map(tuple, read_nb_model(spark, nb_dir).collect()))
    rows_before = spark.read.parquet(nb_dir).count()
    rows_after = compact_nb_state(spark, nb_dir)
    assert [d for d in os.listdir(nb_dir) if d.startswith("batch=")] == ["batch=-1"]
    assert rows_after <= rows_before
    # model (logp, logprior — ln of exact integer ratios) is bit-identical,
    # and it was served through _meta's n_buckets, so _meta survived the swap
    assert sorted(map(tuple, read_nb_model(spark, nb_dir).collect())) == before

    # the meta GUARD also survived: a restart with a different feature hash
    # must still raise against the compacted store
    with pytest.raises(Exception, match="cannot change the feature hash"):
        stream_maintain_nb(
            src(), nb_dir, str(tmp_path / "ck2"), "lang", n_buckets=128, salt="s1"
        ).awaitTermination()

    # continued maintenance at the guarded hash composes
    pd.DataFrame([(99, "alpha alpha", "A")], columns=["doc_id", "text", "lang"]).to_parquet(
        os.path.join(stream_in, "b3.parquet")
    )
    stream_maintain_nb(src(), nb_dir, ckpt, "lang", n_buckets=64, salt="s1").awaitTermination()
    parts = spark.read.parquet(nb_dir)
    # doc-count markers (bucket = -1): A gained exactly one document
    from pyspark.sql import functions as F

    marks = {
        r["label"]: r["c"]
        for r in parts.where(F.col("bucket") == -1).groupBy("label").agg(
            F.sum("c").alias("c")
        ).collect()
    }
    assert marks == {"A": 11, "B": 12}
