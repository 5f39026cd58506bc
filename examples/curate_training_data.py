"""End-to-end training-data curation over the documents table — the pipeline
a 100 TB pre-training corpus actually runs, at toy scale:

    quality filter -> exact dedup -> near-dup groups (keep one per group)
    -> benchmark decontamination -> deterministic split -> sequence packing

Every stage is a DataFrame transformation (no RNG, no Python in the hot
path), so the whole pipeline is one lazy plan per output and scales by
partitioning alone. Runnable:

    python examples/curate_training_data.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.dedup import (
    contamination_stats,
    exact_dedup,
    minhash_lsh_pairs,
    near_dup_groups,
)
from parqueryd_spark.operators.sampling import hash_split, pack_contiguous
from parqueryd_spark.operators.text import quality_score, token_count
from parqueryd_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curate-training-data")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality filter: heuristic score from length/punct/stopword ratios
    docs = docs.filter(quality_score("text") >= 0.3)
    n1 = docs.count()

    # 2. exact dedup: keep the lowest doc_id per content digest
    keep_exact = exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id")
    n2 = docs.count()

    # 3. near-dup groups: MinHash+LSH pairs -> connected components ->
    #    keep each group's canonical (smallest) id
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    groups = near_dup_groups(pairs)
    drop = groups.filter(F.col("doc_id") != F.col("group_id")).select("doc_id")
    docs = docs.join(drop, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. decontamination: drop any doc sharing an 8-gram shingle with the
    #    "benchmark" (here: a held-out slice standing in for an eval suite).
    #    Production checks use 8-13-grams: short grams over-flag on shared
    #    boilerplate, long grams only fire on genuine verbatim overlap.
    bench = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 20 == 0)
    stats = contamination_stats(docs, bench, "doc_id", "text", k=8)
    clean = stats.filter(~F.col("contaminated")).select("doc")
    docs = docs.join(clean, docs.doc_id == clean.doc).drop("doc")
    n4 = docs.count()

    # 5. deterministic split + 2048-token contiguous packing per split
    tokens = docs.select("doc_id", token_count("text").alias("tok"))
    split = hash_split(tokens, "doc_id", {"train": 0.9, "val": 0.1}, salt="v1")
    packed = pack_contiguous(split, "doc_id", "tok", budget=2048, group_cols=["split"])
    bins = (
        packed.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct("bin_id").alias("bins"),
            F.sum("tok").alias("tokens"),
        )
        .orderBy("split")
    )

    print(f"documents: {n0} raw -> {n1} quality -> {n2} exact-deduped "
          f"-> {n3} near-dedup'd -> {n4} decontaminated")
    for r in bins.collect():
        print(f"  {r.split}: {r.docs} docs packed into {r.bins} bins ({r.tokens} tokens)")


if __name__ == "__main__":
    main()
