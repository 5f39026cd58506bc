"""Sub-document exact dedup at ARBITRARY token boundaries, as a lifecycle:

    day 0: substring-dedup the standing corpus and publish its window-digest
           index (the 16-byte-per-window state — historical text is never
           tokenized again)
    day N: dedup ONLY the increment against the stored index + itself
           (O(increment)), apply the droplist wherever bandwidth allows,
           append the increment's new digests

The semantics are the suffix-array analog (Lee et al.): every repeated
substring of >= N tokens, at ANY offset, keeps its first corpus-wide
occurrence. Runnable:

    python examples/substring_dedup_lifecycle.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.dedup import (
    apply_token_droplist,
    substring_dedup,
    substring_dedup_increment,
    substring_index,
)
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.sources.sinks import atomic_publish

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N = 8  # repeat threshold in tokens


def main() -> None:
    spark = get_spark("substring-dedup-lifecycle")
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    increment = docs.filter(F.col("doc_id") >= 400)

    with tempfile.TemporaryDirectory() as work:
        index_path = os.path.join(work, "substr_index")

        # day 0: dedup the standing corpus one-shot, publish the digest index
        day0 = substring_dedup(corpus, "doc_id", "text", min_tokens=N)
        n_affected = day0.count()
        atomic_publish(substring_index(corpus, "doc_id", "text", min_tokens=N), index_path)
        n_digests = spark.read.parquet(index_path).count()
        print(f"day 0: {n_affected} corpus docs had repeats; {n_digests} digests published")

        # day 1: increment dedups against the index + itself — no corpus re-read
        idx = spark.read.parquet(index_path)
        drops = substring_dedup_increment(
            increment, idx, "doc_id", "text", min_tokens=N, mode="droplist"
        )
        rebuilt = apply_token_droplist(increment, drops, "doc_id", "text")
        n_docs = rebuilt.count()
        n_dropped = rebuilt.agg(F.sum("n_dropped")).first()[0] or 0
        print(f"day 1: {n_docs} increment docs, {n_dropped} tokens dropped")

        # the incremental answer equals the one-shot answer over the union,
        # restricted to increment docs (increment ids sort after corpus ids)
        one_shot = {
            (r["doc"], r["n_dropped"], r["dedup_text"])
            for r in substring_dedup(docs, "doc_id", "text", min_tokens=N).collect()
            if r["doc"] >= 400
        }
        incremental = {
            (r["doc"], r["n_dropped"], r["dedup_text"])
            for r in rebuilt.where(F.col("n_dropped") > 0).collect()
        }
        assert incremental == one_shot, "incremental != one-shot on the increment"
        print(f"incremental ≡ one-shot on {len(incremental)} affected increment docs")

        # day 2 readiness: APPEND the increment's new digests — the published
        # index now covers corpus + increment (union-distinct by construction)
        new_digests = substring_index(increment, "doc_id", "text", min_tokens=N).join(
            idx, "digest", "left_anti"
        )
        new_digests.write.mode("append").parquet(index_path)
        grown = spark.read.parquet(index_path).count()
        assert grown >= n_digests
        print(f"appended new digests for tomorrow: index {n_digests} -> {grown} rows")

    spark.stop()


if __name__ == "__main__":
    main()
