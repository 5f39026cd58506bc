"""Streaming index maintenance: micro-batched documents become servable BM25
postings one trigger later; replays are idempotent (partition overwrite);
compaction folds generations without changing scores."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from parqueryd_spark.operators.text import (
    bm25_from_index,
    bm25_scores,
    text_index_publish,
)
from parqueryd_spark.streaming.search import compact_text_index, stream_index_text


def _write(path: str, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path)


ROWS = [
    (1, "spark shuffles hash joins and hash aggregates"),
    (2, "stream processing with watermarks"),
    (3, "hash partitioning for the win"),
    (4, "unrelated prose about nothing in particular"),
    (5, "hash hash hash everywhere"),
]


def test_stream_index_then_serve_matches_batch(spark, tmp_path):
    stream_in = str(tmp_path / "in")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    # publish a seed corpus (first two docs), stream the rest in two batches
    seed = spark.createDataFrame(ROWS[:2], "doc_id long, text string")
    text_index_publish(seed, index_dir, "doc_id", "text")
    _write(os.path.join(stream_in, "b1.parquet"), ROWS[2:4])
    time.sleep(1.1)
    _write(os.path.join(stream_in, "b2.parquet"), ROWS[4:])

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_index_text(docs, index_dir, ckpt).awaitTermination()

    full = spark.createDataFrame(ROWS, "doc_id long, text string")
    terms = ["hash", "stream"]
    want = {
        r["doc"]: (r["n_match"], round(r["score"], 9))
        for r in bm25_scores(full, "doc_id", "text", terms).collect()
    }
    got = {
        r["doc"]: (r["n_match"], round(r["score"], 9))
        for r in bm25_from_index(spark, index_dir, terms).collect()
    }
    assert got == want

    # replaying the drained stream against the same checkpoint changes nothing
    stream_index_text(docs, index_dir, ckpt).awaitTermination()
    again = {
        r["doc"]: (r["n_match"], round(r["score"], 9))
        for r in bm25_from_index(spark, index_dir, terms).collect()
    }
    assert again == got

    # compaction folds batch generations; scores and stats are unchanged
    n_postings = compact_text_index(spark, index_dir, target_partitions=2)
    assert n_postings == spark.createDataFrame(ROWS, "doc_id long, text string").select(
        F.explode(F.array_distinct(F.split("text", " ")))
    ).count()
    compacted = {
        r["doc"]: (r["n_match"], round(r["score"], 9))
        for r in bm25_from_index(spark, index_dir, terms).collect()
    }
    assert compacted == got

    # and a post-compaction stream increment still lands and serves
    _write(os.path.join(stream_in, "b3.parquet"), [(6, "one more hash document")])
    stream_index_text(docs, index_dir, ckpt).awaitTermination()
    served = {r["doc"] for r in bm25_from_index(spark, index_dir, ["hash"]).collect()}
    assert 6 in served


def test_index_serve_excludes_null_text_consistently(spark, tmp_path):
    """serve == scan must hold on dirty corpora: null-text docs are excluded
    from N and avgdl identically on both paths."""
    from parqueryd_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        text_index_publish,
    )

    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "hash hash stream"), (3, None)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    text_index_publish(docs, idx, "doc_id", "text")
    scan = {
        r["doc"]: round(r["score"], 9)
        for r in bm25_scores(docs, "doc_id", "text", ["hash"]).collect()
    }
    served = {
        r["doc"]: round(r["score"], 9)
        for r in bm25_from_index(spark, idx, ["hash"]).collect()
    }
    assert served == scan and 3 not in scan


def test_append_and_stream_batch_ids_never_collide(spark, tmp_path):
    """A manual append (negative generation) followed by a stream whose
    checkpoint starts at micro-batch 0 must not overwrite each other — the
    id spaces are disjoint by construction. (Regression: appends once
    allocated batch=0, and the stream's first micro-batch silently wiped
    the appended increment.)"""
    from parqueryd_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        text_index_append,
        text_index_publish,
    )

    all_rows = ROWS + [(6, "hash and stream together"), (7, "stream alone here")]
    seed = spark.createDataFrame(all_rows[:2], "doc_id long, text string")
    appended = spark.createDataFrame(all_rows[2:5], "doc_id long, text string")
    index_dir = str(tmp_path / "idx")
    text_index_publish(seed, index_dir, "doc_id", "text")
    text_index_append(spark, index_dir, appended, "doc_id", "text")

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    _write(os.path.join(stream_in, "s1.parquet"), all_rows[5:])
    schema = spark.read.parquet(os.path.join(stream_in, "s1.parquet")).schema
    docs = spark.readStream.schema(schema).parquet(stream_in)
    stream_index_text(docs, index_dir, str(tmp_path / "ckpt")).awaitTermination()

    full = spark.createDataFrame(all_rows, "doc_id long, text string")
    terms = ["hash", "stream"]
    want = {
        r["doc"]: round(r["score"], 9)
        for r in bm25_scores(full, "doc_id", "text", terms).collect()
    }
    got = {
        r["doc"]: round(r["score"], 9)
        for r in bm25_from_index(spark, index_dir, terms).collect()
    }
    assert got == want  # the appended docs survived the stream's batch 0
