"""The daily-increment dedup loop a growing corpus actually runs:

    day 0: build the minhash index for the corpus, publish it atomically
    day N: index only the increment, find near-dups against the stored
           corpus index + within the increment, drop them, and publish the
           merged index for day N+1

The expensive tokenize->shingle->hash pass runs once per document EVER; each
day's cost scales with the increment, not the corpus. Runnable:

    python examples/incremental_dedup.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.dedup import incremental_minhash_pairs, minhash_index
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.sources.sinks import atomic_publish

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("incremental-dedup")
    docs = load_table(spark, SF_DIR, "documents")
    # simulate a growing corpus: even ids arrived yesterday, odd ids today
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    increment = docs.filter(F.col("doc_id") % 2 == 1)

    with tempfile.TemporaryDirectory() as work:
        index_path = os.path.join(work, "dedup_index")

        # day 0: index the corpus once and publish it all-or-nothing
        atomic_publish(minhash_index(corpus, "doc_id", "text"), index_path)
        print(f"day 0: indexed {spark.read.parquet(index_path).count()} corpus docs")

        # day 1: index ONLY the increment; dedup against the stored index
        new_index = minhash_index(increment, "doc_id", "text")
        stored = spark.read.parquet(index_path)
        pairs = incremental_minhash_pairs(new_index, stored, threshold=0.8)
        # drop policy: a new doc duplicating a CORPUS doc always goes (the
        # corpus copy is already serving — note the new id can be either pair
        # side, id order says nothing about which side is new); between two
        # new dups, keep the smaller id
        def is_new(c):
            return F.col(c) % 2 == 1

        vs_corpus = pairs.filter(~is_new("id_a") | ~is_new("id_b")).select(
            F.when(is_new("id_a"), F.col("id_a")).otherwise(F.col("id_b")).alias("doc_id")
        )
        new_new = pairs.filter(is_new("id_a") & is_new("id_b")).select(
            F.col("id_b").alias("doc_id")
        )
        drop = vs_corpus.union(new_new).distinct()
        kept = increment.join(drop, "doc_id", "left_anti")
        print(
            f"day 1: {increment.count()} new docs, {pairs.count()} near-dup pairs, "
            f"{drop.count()} dropped, {kept.count()} kept"
        )

        # publish the merged index for day 2 (same barrier semantics)
        merged = stored.unionByName(
            minhash_index(kept, "doc_id", "text")
        )
        atomic_publish(merged, index_path)
        print(f"day 2 index: {spark.read.parquet(index_path).count()} docs")


if __name__ == "__main__":
    main()
