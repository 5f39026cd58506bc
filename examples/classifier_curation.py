"""Model-based curation with a classifier trained IN the engine — the
fasttext-shaped loop every large corpus pipeline runs, with no model file
and no Python row loop:

    1. train a multinomial NB language/domain classifier on the labeled
       slice (one counting scan; operators/classify.nb_train)
    2. PUBLISH the dense model table atomically (the same frozen-model
       contract as the LM / BM25 / ANN indexes)
    3. classify an incoming unlabeled stream against the frozen model
       (streaming/classify.stream_classify_documents, idempotent batches)
    4. route documents by predicted class + score margin, and audit the
       confusion matrix against the held-out labels
    5. day N: retrain by ADDING count partials (nb_count_partials /
       stream_maintain_nb) — counts are the sufficient statistics, so the
       merged model is bit-identical to retraining from scratch, at the
       cost of the increment only.

Runnable:

    python examples/classifier_curation.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.classify import (
    nb_count_partials,
    nb_model_from_partials,
    nb_score,
    nb_train,
)
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.sources.sinks import atomic_publish
from parqueryd_spark.streaming.classify import stream_classify_documents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N_BUCKETS = 1024


def main() -> None:
    spark = get_spark("classifier-curation")
    docs = load_table(spark, SF_DIR, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)   # the labeled slice
    incoming = docs.where(F.col("doc_id") % 2 == 1)  # pretend-unlabeled crawl

    with tempfile.TemporaryDirectory() as work:
        # 1-2. train once, publish the frozen model (a few thousand rows)
        model_dir = os.path.join(work, "nb_model")
        atomic_publish(nb_train(train, "lang", n_buckets=N_BUCKETS), model_dir)
        model = spark.read.parquet(model_dir)
        print(f"published model: {model.count()} (class, bucket) rows")

        # 3. stream the crawl against the frozen model in two micro-batches
        stream_in = os.path.join(work, "in")
        scores_dir = os.path.join(work, "scores")
        os.makedirs(stream_in)
        pdf = incoming.select("doc_id", "text").toPandas()
        pdf.iloc[: len(pdf) // 2].to_parquet(os.path.join(stream_in, "b1.parquet"))
        pdf.iloc[len(pdf) // 2 :].to_parquet(os.path.join(stream_in, "b2.parquet"))
        schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
        src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
        stream_classify_documents(
            src, model, scores_dir, os.path.join(work, "ckpt"), n_buckets=N_BUCKETS
        ).awaitTermination()

        # 4. route + audit against the held-out labels
        scored = spark.read.parquet(scores_dir).drop("batch")
        confusion = (
            scored.withColumnRenamed("label", "predicted")
            .join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang", "predicted")
            .agg(F.count("*").alias("n"))
            .orderBy("lang", "predicted")
        )
        confusion.show(30, truncate=False)
        acc = (
            confusion.agg(
                (
                    F.sum(F.when(F.col("lang") == F.col("predicted"), F.col("n")).otherwise(0))
                    / F.sum("n")
                ).alias("acc")
            ).collect()[0]["acc"]
        )
        # context: the synthetic corpus's text is mostly language-INDEPENDENT
        # (same vocabulary everywhere, sparse marker words only — the same
        # ceiling the marker heuristic hits in text_token_lang_stats), so
        # compare against the majority-class baseline, not 1.0
        majority = (
            incoming.groupBy("lang").count().agg(F.max("count") / F.sum("count")).collect()[0][0]
        )
        print(
            f"held-out accuracy: {acc:.3f} (majority-class baseline {majority:.3f}; "
            "the synthetic corpus shares one vocabulary across langs, so the "
            "Bayes ceiling is low — the CONTRACT being demonstrated is the "
            "lifecycle and the bit-exact incremental retrain below)"
        )

        # 5. incremental retrain: day-N increment adds its count partials;
        # the merged model is bit-identical to a from-scratch retrain
        inc_a = nb_count_partials(train.where(F.col("doc_id") % 4 == 0), "lang", n_buckets=N_BUCKETS)
        inc_b = nb_count_partials(train.where(F.col("doc_id") % 4 == 2), "lang", n_buckets=N_BUCKETS)
        merged = nb_model_from_partials(inc_a.unionByName(inc_b), n_buckets=N_BUCKETS)
        direct = nb_train(train, "lang", n_buckets=N_BUCKETS)
        diff = merged.withColumnRenamed("logp", "m").join(
            direct.withColumnRenamed("logp", "d").select("label", "bucket", "d"),
            ["label", "bucket"],
        )
        n_off = diff.where(F.col("m") != F.col("d")).count()
        assert n_off == 0, n_off
        print("incremental merge == from-scratch retrain (bit-equal logps)")

        # and the served predictions from the merged model match too
        p1 = {(r.doc_id, r.label) for r in nb_score(incoming, merged, n_buckets=N_BUCKETS).collect()}
        p2 = {(r.doc_id, r.label) for r in scored.select("doc_id", "label").collect()}
        assert p1 == p2
        print("merged-model predictions match the served stream output")

    spark.stop()


if __name__ == "__main__":
    main()
