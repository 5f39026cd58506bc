"""End-to-end training-data curation over the documents table — the pipeline
a 100 TB pre-training corpus actually runs, at toy scale:

    input quality gate -> PII redaction -> quality filter -> exact dedup
    -> sub-document span dedup -> near-dup groups (keep one per group)
    -> benchmark decontamination -> overlong-doc chunking
    -> deterministic split -> sequence packing

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
from parqueryd_spark.operators.pii import redact_pii
from parqueryd_spark.operators.quality import (
    check_not_null,
    check_unique,
    quality_report,
)
from parqueryd_spark.operators.sampling import chunk_documents, hash_split, pack_contiguous
from parqueryd_spark.operators.text import quality_score, token_count
from parqueryd_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curate-training-data")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 0. input quality gate: refuse to curate a broken drop (dup/null ids
    #    here poison every downstream keep-by-id decision)
    gate = quality_report(
        [check_unique(docs, ["doc_id"]), check_not_null(docs, ["doc_id", "text"])]
    ).collect()
    failed = [r.check for r in gate if not r.passed]
    if failed:
        raise SystemExit(f"input rejected, failing checks: {failed}")

    # 0b. PII redaction: scrub before anything downstream persists text
    docs = docs.withColumn("text", redact_pii("text"))

    # 1. quality filter: heuristic score from length/punct/stopword ratios
    docs = docs.filter(quality_score("text") >= 0.3)
    n1 = docs.count()

    # 2. exact dedup: keep the lowest doc_id per content digest
    keep_exact = exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id")
    n2 = docs.count()

    # 2b. sub-document span dedup: boilerplate repeated across documents
    #     survives only in its first bearer (16-token spans in production;
    #     3 here so the toy corpus actually repeats some)
    from parqueryd_spark.operators.dedup import span_dedup

    deduped = span_dedup(docs, "doc_id", "text", span_tokens=3).filter(
        F.col("n_kept") > 0
    )
    docs = docs.drop("text").join(
        deduped.select(F.col("doc").alias("doc_id"), F.col("dedup_text").alias("text")),
        "doc_id",
    )

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

    # 4b. chunk overlong docs into max-length windows (512/64 in production;
    #     16/4 here so the toy docs actually split); chunks become the
    #     packing unit, keyed (doc_id, chunk_id)
    chunks = chunk_documents(docs, "doc_id", "text", max_tokens=16, overlap=4)
    n5 = chunks.count()

    # 5. deterministic split + 2048-token contiguous packing per split
    tokens = chunks.select(
        F.concat_ws("#", F.col("doc").cast("string"), F.col("chunk_id").cast("string")
                    ).alias("doc_id"),
        F.col("n_chunk_tokens").alias("tok"),
    )
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
          f"-> {n3} near-dedup'd -> {n4} decontaminated -> {n5} chunks")
    for r in bins.collect():
        print(f"  {r.split}: {r.docs} docs packed into {r.bins} bins ({r.tokens} tokens)")


if __name__ == "__main__":
    main()
