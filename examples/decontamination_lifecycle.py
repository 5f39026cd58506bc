"""Benchmark decontamination at SUBSTRING grain, as a lifecycle (r12):

    once:  publish the benchmark/eval set's window-digest index (the only
           artifact the training side ever touches — benchmark TEXT never
           leaves its enclave)
    batch: scrub the standing training corpus against the index — every
           >= N-token window whose content appears in the benchmark drops,
           at ANY offset, in EVERY document (no keeper; surgical token
           removal instead of document drops)
    daily: scrub each streaming increment against the SAME frozen index
           (stream_substring_decontaminate — stateless per batch, idempotent
           batch=<id> outputs)

The grain guard added in r12 is part of the contract: consuming the index at
the wrong ``min_tokens`` RAISES instead of silently matching nothing (a
silent no-op here would ship benchmark leakage into the training set).
Runnable:

    python examples/decontamination_lifecycle.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.dedup import (
    substring_decontaminate,
    substring_index,
)
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.streaming.dedup import stream_substring_decontaminate

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N = 8  # contamination window, in tokens


def main() -> None:
    spark = get_spark("decontamination-lifecycle")
    docs = load_table(spark, SF_DIR, "documents")
    # stand-in benchmark: every 5th doc; training corpus: the rest
    benchmark = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter((F.col("doc_id") % 5 != 0) & (F.col("doc_id") < 400))
    increments = docs.filter((F.col("doc_id") % 5 != 0) & (F.col("doc_id") >= 400))

    with tempfile.TemporaryDirectory() as work:
        taint_path = os.path.join(work, "benchmark_index")

        # once: publish the benchmark's digest index — 16 bytes per distinct
        # window; the benchmark text itself never crosses into this pipeline
        substring_index(benchmark, "doc_id", "text", min_tokens=N).write.parquet(taint_path)
        taint = spark.read.parquet(taint_path)
        print(f"benchmark index: {taint.count()} distinct {N}-token windows")

        # batch: scrub the standing corpus (affected docs come back rebuilt)
        scrubbed = substring_decontaminate(corpus, taint, "doc_id", "text", min_tokens=N)
        hits = scrubbed.collect()
        print(f"standing corpus: {len(hits)} contaminated docs scrubbed")
        for r in hits[:3]:
            print(f"  doc {r['doc']}: dropped {r['n_dropped']}/{r['n_tokens']} tokens")

        # the grain guard: consuming the index at the wrong window length
        # raises — it can never silently pass leakage as clean
        try:
            substring_decontaminate(corpus, taint, "doc_id", "text", min_tokens=4)
        except ValueError as e:
            print(f"grain guard: {str(e).splitlines()[0][:72]}...")

        # daily: stream increments against the SAME frozen index
        stream_in = os.path.join(work, "incoming")
        out_dir = os.path.join(work, "scrubbed")
        ckpt = os.path.join(work, "ckpt")
        increments.write.parquet(stream_in)
        doc_stream = spark.readStream.schema(increments.schema).parquet(stream_in)
        stream_substring_decontaminate(
            doc_stream, taint_path, out_dir, ckpt, min_tokens=N
        ).awaitTermination()
        streamed = spark.read.parquet(out_dir)
        print(f"streamed increments: {streamed.count()} contaminated docs scrubbed")

    spark.stop()


if __name__ == "__main__":
    main()
