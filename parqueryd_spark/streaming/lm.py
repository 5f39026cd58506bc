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

Model parameters travel WITH the state: ``stream_maintain_lm`` persists a
``_meta`` file (k, n) next to the batch partitions (the leading underscore
hides it from the merge-on-read parquet listing), and ``read_lm`` reads it
back — maintaining with n=3 then loading can never silently split grams at
the wrong position.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parqueryd_spark.operators.lm import NgramLM, lm_merge, lm_score, ngram_counts


def stream_maintain_lm(
    doc_stream: DataFrame,
    lm_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n: int = 2,
    k: float = 0.5,
):
    """Continuously-trained LM state: per micro-batch, one partial
    (gram, c) count table in ``batch=<id>`` (idempotent overwrite). Raw text
    is never re-read at serve time — the partials ARE the model. The (k, n)
    meta rides along in ``<lm_dir>/_meta`` so ``read_lm`` serves the model
    at the order it was maintained with."""

    meta_written = False

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal meta_written
        if not meta_written:
            # (k, n) are constant for the stream's lifetime — one write, not
            # one per micro-batch (idempotent overwrite either way)
            spark = batch_df.sparkSession
            spark.createDataFrame([(float(k), int(n))], "k double, n int").write.mode(
                "overwrite"
            ).parquet(os.path.join(lm_dir, "_meta"))
            meta_written = True
        part = ngram_counts(batch_df, text_col, n)
        part.write.mode("overwrite").parquet(os.path.join(lm_dir, f"batch={batch_id}"))

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_lm(spark, lm_dir: str, k: float | None = None, n: int | None = None) -> NgramLM:
    """The served LM over ALL published batches: merge-on-read of the count
    partials (sum per gram — linear, so this equals one-shot ``lm_train``
    over the full corpus bit-exactly).

    (k, n) default to the persisted ``_meta`` written by
    :func:`stream_maintain_lm`; explicit arguments override. Either way the
    stored grams' token count is validated against n — a model maintained at
    one order can never be silently served at another (grams would split at
    the wrong position and score garbage without an error)."""
    meta_path = os.path.join(lm_dir, "_meta")
    try:
        meta = spark.read.parquet(meta_path).collect()[0]
        stored_k, stored_n = float(meta["k"]), int(meta["n"])
    except Exception:
        stored_k, stored_n = None, None  # pre-meta layout — fall back to args
    k = k if k is not None else (stored_k if stored_k is not None else 0.5)
    n = n if n is not None else (stored_n if stored_n is not None else 2)
    parts = spark.read.parquet(lm_dir).drop("batch")
    probe = parts.select(F.size(F.split("gram", " ")).alias("toks")).limit(1).collect()
    if probe and probe[0]["toks"] != n:
        raise ValueError(
            f"stored grams have {probe[0]['toks']} tokens but the requested "
            f"order is n={n} — the model was maintained at a different order"
        )
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
