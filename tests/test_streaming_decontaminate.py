"""Streaming decontamination against a published bloom: per-batch clean
output equals batch NOT-IN semantics, clean batches never read the benchmark
table, and replays are idempotent (partition overwrite)."""

from __future__ import annotations

import os
import time

import pandas as pd

from parqueryd_spark.streaming.membership import (
    publish_bloom,
    read_clean,
    stream_decontaminate,
)

BENCH = [f"benchmark question {i} with its exact canonical wording" for i in range(50)]
CLEAN = [f"ordinary training document number {i} about something else" for i in range(6)]


def test_stream_decontaminate_exact_and_idempotent(spark, tmp_path):
    bench_pq = str(tmp_path / "bench")
    bloom_dir = str(tmp_path / "bloom")
    stream_in = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    bench = spark.createDataFrame([(t,) for t in BENCH], "text string")
    bench.write.parquet(bench_pq)
    publish_bloom(bench, "text", bloom_dir)

    # batch 1: two clean docs + one verbatim benchmark leak
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [CLEAN[0], BENCH[7], CLEAN[1]]}
    ).to_parquet(os.path.join(stream_in, "b1.parquet"))
    time.sleep(1.1)
    # batch 2: all clean
    pd.DataFrame(
        {"doc_id": [4, 5], "text": [CLEAN[2], CLEAN[3]]}
    ).to_parquet(os.path.join(stream_in, "b2.parquet"))

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    q = stream_decontaminate(docs, bloom_dir, bench_pq, out_dir, ckpt, "text")
    q.awaitTermination()

    kept = sorted(r.doc_id for r in read_clean(spark, out_dir).collect())
    assert kept == [1, 3, 4, 5]  # doc 2 is the leak

    # replay with the same checkpoint: no duplicates (overwrite semantics)
    q2 = stream_decontaminate(docs, bloom_dir, bench_pq, out_dir, ckpt, "text")
    q2.awaitTermination()
    assert sorted(r.doc_id for r in read_clean(spark, out_dir).collect()) == [1, 3, 4, 5]

    # a later batch that bloom-misses entirely stays clean end-to-end
    pd.DataFrame({"doc_id": [6], "text": [CLEAN[4]]}).to_parquet(
        os.path.join(stream_in, "b3.parquet")
    )
    q3 = stream_decontaminate(docs, bloom_dir, bench_pq, out_dir, ckpt, "text")
    q3.awaitTermination()
    assert sorted(r.doc_id for r in read_clean(spark, out_dir).collect()) == [
        1,
        3,
        4,
        5,
        6,
    ]
