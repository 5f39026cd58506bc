"""Streaming faces of the bigram-LM family (operators/lm.py).

Two directions, mirroring the sketch family's batch/stream symmetry:

- **maintain**: bigram counts are LINEAR (merge = sum matching gram rows),
  so continuous training is the Count-Min/HLL contract from
  streaming/rollup.py — each micro-batch lands its own partial count table
  in an idempotent ``batch=<id>`` partition (replays overwrite themselves,
  effectively-exactly-once), and the served LM is merge-on-read:
  ``read_lm`` ≡ ``lm_train`` over the concatenated corpus, bit-exact, by
  linearity. State per batch is O(distinct grams in the batch).
- **score**: scoring a document stream against a FROZEN LM is stateless
  per-batch relational work (two equi-joins + an aggregation), so the
  streaming scorer is foreachBatch over the identical batch plan — the same
  frozen-model pattern as streaming/embed.py (frozen grid/centroids): the
  model only moves when a maintenance trigger republishes it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from parqueryd_spark.operators.lm import NgramLM, lm_merge, lm_score, ngram_counts


def stream_maintain_lm(
    doc_stream: DataFrame,
    lm_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n: int = 2,
):
    """Continuously-trained LM state: per micro-batch, one partial
    (gram, c) count table in ``batch=<id>`` (idempotent overwrite). Raw text
    is never re-read at serve time — the partials ARE the model."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        part = ngram_counts(batch_df, text_col, n)
        part.write.mode("overwrite").parquet(os.path.join(lm_dir, f"batch={batch_id}"))

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_lm(spark, lm_dir: str, k: float = 0.5, n: int = 2) -> NgramLM:
    """The served LM over ALL published batches: merge-on-read of the count
    partials (sum per gram — linear, so this equals one-shot ``lm_train``
    over the full corpus bit-exactly)."""
    parts = spark.read.parquet(lm_dir).drop("batch")
    return lm_merge([parts], k, n)


def stream_score_documents(
    doc_stream: DataFrame,
    lm: NgramLM,
    scores_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Score an incoming document stream against a frozen LM, landing
    (id, n_bigrams, avg_nll, ppl) per batch in idempotent ``batch=<id>``
    partitions — batch-equivalent to operators/lm.lm_score row-for-row."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = lm_score(batch_df, id_col, lm, text_col)
        out.write.mode("overwrite").parquet(os.path.join(scores_dir, f"batch={batch_id}"))

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
