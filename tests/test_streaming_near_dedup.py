"""Streaming near-dedup: micro-batches filtered against the published minhash
index — cross-batch dups dropped without re-shingling history, in-batch dups
keep the smallest id, replayed batches are idempotent (partition overwrite)."""

from __future__ import annotations

import os
import time

import pandas as pd

from parqueryd_spark.streaming.dedup import read_index, stream_near_dedup

DOC_A = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "completely unrelated content about spark shuffles and parquet row groups"
DOC_C = "a third document with its own words never repeated anywhere else at all"


def _write(path: str, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path)


def test_stream_near_dedup_cross_and_in_batch(spark, tmp_path):
    stream_in = str(tmp_path / "in")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    # batch 1: two distinct docs + an in-batch verbatim dup of doc 1
    _write(os.path.join(stream_in, "b1.parquet"), [(1, DOC_A), (2, DOC_B), (3, DOC_A)])
    time.sleep(1.1)
    # batch 2: a cross-batch dup of doc 1 and a genuinely new doc
    _write(os.path.join(stream_in, "b2.parquet"), [(4, DOC_A), (5, DOC_C)])

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    q = stream_near_dedup(docs, index_dir, ckpt, threshold=0.8)
    q.awaitTermination()

    kept = sorted(r.doc for r in read_index(spark, index_dir).collect())
    # 3 dropped in-batch (dup of 1, larger id); 4 dropped cross-batch
    assert kept == [1, 2, 5]

    # replaying the same input with the same checkpoint adds nothing
    q2 = stream_near_dedup(docs, index_dir, ckpt, threshold=0.8)
    q2.awaitTermination()
    assert sorted(r.doc for r in read_index(spark, index_dir).collect()) == [1, 2, 5]

    # compaction folds the per-batch partitions into one generation without
    # changing the data or breaking the stream's index-dir contract
    from parqueryd_spark.streaming.dedup import compact_index

    assert compact_index(spark, index_dir, target_partitions=2) == 3
    assert sorted(r.doc for r in read_index(spark, index_dir).collect()) == [1, 2, 5]

    # a later increment deduped against the COMPACTED index still sees doc 1
    _write(os.path.join(stream_in, "b3.parquet"), [(6, DOC_A), (7, DOC_B)])
    q3 = stream_near_dedup(docs, index_dir, ckpt, threshold=0.8)
    q3.awaitTermination()
    assert sorted(r.doc for r in read_index(spark, index_dir).collect()) == [1, 2, 5]


def test_stream_near_dedup_replays_inflight_partition(spark, tmp_path):
    """Crash-recovery: a prior attempt wrote its batch=<id> partition but died
    before the checkpoint committed. The replay must exclude that doomed
    partition from the corpus read (it is about to be overwritten — listing
    it and then deleting it under the lazy scan fails every restart with
    FileNotFound) and produce the partition's correct final content. The
    index dir is a file:-scheme URI here, so the exists-probe goes through
    Hadoop FileSystem — an os.path probe would silently see no index at all
    on an object store."""
    from parqueryd_spark.operators.dedup import minhash_index

    stream_in = str(tmp_path / "in")
    index_dir = f"file://{tmp_path}/index"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)
    _write(os.path.join(stream_in, "b1.parquet"), [(1, DOC_A), (2, DOC_B)])

    # the dead attempt's half-written batch=0 partition (checkpoint is fresh,
    # so the first replayed micro-batch gets id 0 and overwrites it)
    pre = minhash_index(
        spark.createDataFrame([(1, DOC_A)], "doc_id long, text string"), "doc_id", "text", 3, 128
    )
    pre.write.mode("overwrite").parquet(index_dir + "/batch=0")

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    q = stream_near_dedup(docs, index_dir, ckpt, threshold=0.8)
    q.awaitTermination()
    # both docs survive: the stale partition must NOT have served as corpus
    # (doc 1 would otherwise collide with its own ghost) nor crashed the scan
    assert sorted(r.doc for r in read_index(spark, index_dir).collect()) == [1, 2]
