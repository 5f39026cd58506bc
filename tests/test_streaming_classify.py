"""Streaming NB classification must be batch-equivalent: the union of
per-batch outputs against a frozen PUBLISHED model equals one-shot
nb_score over all the documents, row for row, and a checkpoint replay
changes nothing."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F  # noqa: F401

from parqueryd_spark.operators.classify import nb_score, nb_train
from parqueryd_spark.sources.sinks import atomic_publish
from parqueryd_spark.streaming.classify import stream_classify_documents


def test_stream_classify_matches_batch_and_replays(spark, tmp_path):
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta beta gamma", "A"))
    for i in range(30, 60):
        rows.append((i, "delta epsilon epsilon zeta", "B"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # train + PUBLISH the frozen model, then read it back (the serve shape)
    model_dir = str(tmp_path / "nb_model")
    atomic_publish(nb_train(docs, "lang", n_buckets=64), model_dir)
    model = spark.read.parquet(model_dir)

    stream_in = str(tmp_path / "in")
    scores_dir = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf.iloc[:25].to_parquet(os.path.join(stream_in, "b1.parquet"))
    pdf.iloc[25:].to_parquet(os.path.join(stream_in, "b2.parquet"))

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_classify_documents(src, model, scores_dir, ckpt, n_buckets=64).awaitTermination()

    streamed = {
        (r.doc_id, r.label, r.score)
        for r in spark.read.parquet(scores_dir).drop("batch").collect()
    }
    oneshot = {
        (r.doc_id, r.label, r.score)
        for r in nb_score(docs, model, n_buckets=64).collect()
    }
    assert streamed == oneshot
    assert all(lab == ("A" if d < 30 else "B") for d, lab, _ in streamed)

    # replayed drain (no new files): idempotent partitions, nothing changes
    src2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_classify_documents(src2, model, scores_dir, ckpt, n_buckets=64).awaitTermination()
    streamed2 = {
        (r.doc_id, r.label, r.score)
        for r in spark.read.parquet(scores_dir).drop("batch").collect()
    }
    assert streamed2 == streamed


def test_stream_maintain_nb_equals_one_shot_and_guards_meta(spark, tmp_path):
    """Maintained count partials must finalize to EXACTLY the one-shot
    nb_train model (integer sufficient statistics add associatively; the
    only floats are final ln() of equal ratios), a replayed drain changes
    nothing, and restarting with a different feature hash must raise."""
    import pytest

    from parqueryd_spark.streaming.classify import read_nb_model, stream_maintain_nb

    rows = [(i, "alpha beta beta", "A") for i in range(20)] + [
        (i, "delta epsilon", "B") for i in range(20, 45)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    stream_in = str(tmp_path / "in")
    nb_dir = str(tmp_path / "nb")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf.iloc[:17].to_parquet(os.path.join(stream_in, "b1.parquet"))
    pdf.iloc[17:].to_parquet(os.path.join(stream_in, "b2.parquet"))

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema

    def drain():
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )
        stream_maintain_nb(src, nb_dir, ckpt, "lang", n_buckets=64).awaitTermination()

    drain()
    served = {
        (r.label, r.bucket): (r.logp, r.logprior)
        for r in read_nb_model(spark, nb_dir).collect()
    }
    direct = {
        (r.label, r.bucket): (r.logp, r.logprior)
        for r in nb_train(docs, "lang", n_buckets=64).collect()
    }
    assert served == direct  # bit-equal, not approx

    drain()  # checkpoint replay: no new files, identical state
    served2 = {
        (r.label, r.bucket): (r.logp, r.logprior)
        for r in read_nb_model(spark, nb_dir).collect()
    }
    assert served2 == served

    # feature-hash change on an existing store must refuse, not mix spaces
    src3 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    )
    pdf.iloc[:1].to_parquet(os.path.join(stream_in, "b3.parquet"))  # force a batch
    q = stream_maintain_nb(
        src3, nb_dir, str(tmp_path / "ckpt2"), "lang", n_buckets=128
    )
    with pytest.raises(Exception, match="cannot change the feature hash"):
        q.awaitTermination()
