"""The CCNet loop on this engine, end to end (Wenzek et al. 2020: train an
LM on a trusted reference corpus, score the crawl, keep the low-perplexity
tail):

    1. train an order-n LM on the "reference" slice and PUBLISH it
       (counts are the model; publishing is one parquet dataset)
    2. stream the "crawl" in; each micro-batch is scored against the FROZEN
       published LM (no state, two equi-joins) into idempotent batch parts
    3. keep documents under the perplexity threshold chosen from the exact
       score distribution (exact quantile via histogram narrowing — no
       global sort)
    4. grow the LM later with lm_append at O(increment) — the standing
       corpus is never re-scanned

Runnable:

    python examples/lm_quality_curation.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.lm import lm_load, lm_publish, lm_score
from parqueryd_spark.operators.selection import exact_quantiles
from parqueryd_spark.streaming.lm import stream_score_documents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("lm-quality-curation")
    work = tempfile.mkdtemp(prefix="lm_curation_")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # 1. train on the trusted slice (here: the 'wiki'-like longest docs),
    #    publish the counts — the model is a parquet dataset
    reference = docs.orderBy(F.col("n_chars").desc()).limit(200)
    lm_dir = os.path.join(work, "lm")
    lm_publish(spark, lm_dir, reference, k=0.5, n=2)
    lm = lm_load(spark, lm_dir)
    print(f"published LM: {lm.bigrams.count()} grams, order n={lm.n}")

    # 2. score the full corpus as a stream against the FROZEN model
    crawl_dir = os.path.join(work, "crawl")
    docs.write.parquet(crawl_dir)
    stream = spark.readStream.schema(docs.schema).parquet(crawl_dir)
    q = stream_score_documents(
        stream, lm, os.path.join(work, "scores"), os.path.join(work, "ckpt")
    )
    q.awaitTermination()
    scores = spark.read.parquet(os.path.join(work, "scores")).drop("batch")

    # 3. threshold from the EXACT score distribution: keep below the p60
    #    perplexity (the 'head+middle' CCNet buckets)
    dist = exact_quantiles(spark, scores, "ppl", [0.3, 0.6, 0.9])
    cut = {r["prob"]: r["value"] for r in dist.collect()}[0.6]
    kept = scores.filter(F.col("ppl") <= cut).join(docs, "doc_id")
    print(f"perplexity p60 cut = {cut:.2f}: kept {kept.count()} of {docs.count()} docs")

    # 4. the audit view: per-source mean perplexity (which sources are
    #    off-distribution vs the reference slice)
    per_source = (
        scores.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.round(F.avg("ppl"), 2).alias("mean_ppl"), F.count("*").alias("n_docs"))
        .orderBy("mean_ppl")
    )
    per_source.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
