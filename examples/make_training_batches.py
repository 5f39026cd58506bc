"""Documents to training batches, end to end:

    1. curation gate: quality score + Gopher repetition thresholds
    2. exact dedup (bag-of-words fingerprint, keep lowest id)
    3. tokenize + encode to input_ids under a frequency-ranked vocab
    4. pack documents end-to-end into fixed-budget sequences with
       per-document boundary offsets (for the block-diagonal attention mask)
    5. write sequences + vocab as the training-ready dataset

Runnable:

    python examples/make_training_batches.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.dedup import exact_dedup
from parqueryd_spark.operators.sampling import materialize_packed_sequences
from parqueryd_spark.operators.text import (
    build_vocab,
    encode_documents,
    quality_score,
    repetition_ok,
)
from parqueryd_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SEQ_LEN = 256


def main() -> None:
    spark = get_spark("make-training-batches")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1-2. curate, then dedup the survivors
    gated = docs.where((quality_score("text") >= 0.35) & repetition_ok("text"))
    n1 = gated.count()
    keep_ids = exact_dedup(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    kept = gated.join(keep_ids, "doc_id", "left_semi")
    n2 = kept.count()
    print(f"curation: {n0} docs -> {n1} gated -> {n2} after exact dedup")

    # 3. vocab + encode (vocab from the KEPT corpus — train-set statistics)
    vocab = build_vocab(kept, "text")
    encoded = encode_documents(kept, "doc_id", "text", vocab=vocab)

    # 4. pack into SEQ_LEN-token sequences
    seqs = materialize_packed_sequences(encoded, seq_len=SEQ_LEN)

    with tempfile.TemporaryDirectory() as tmp:
        seqs.write.parquet(os.path.join(tmp, "sequences"))
        vocab.write.parquet(os.path.join(tmp, "vocab"))
        back = spark.read.parquet(os.path.join(tmp, "sequences"))
        stats = back.agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("n_tokens").alias("avg_fill"),
            F.avg("n_docs").alias("avg_docs_per_seq"),
        ).head()
        # conservation: no token invented or lost between encode and pack
        assert stats["total_tokens"] == encoded.agg(F.sum(F.size("input_ids"))).head()[0]
        print(
            f"packed {stats['n_seqs']} sequences of budget {SEQ_LEN}: "
            f"avg fill {stats['avg_fill']:.1f} tokens, "
            f"avg {stats['avg_docs_per_seq']:.1f} docs/sequence"
        )
        v = spark.read.parquet(os.path.join(tmp, "vocab")).count()
        print(f"vocab size {v}; dataset written with sequences + vocab side by side")

    spark.stop()


if __name__ == "__main__":
    main()
