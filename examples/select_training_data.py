"""Data-selection walkthrough — what runs AFTER curation has deduped the
corpus: decide which surviving documents (and embeddings) a model trains on,
split them safely, shuffle them deterministically, and publish the audit
card. At toy scale over the testdata tables:

    semantic dedup (SemDeDup) over embeddings
    -> prototypicality pruning (drop the easiest quartile)
    -> leakage-safe train/val/test split (near-dup groups stay together)
    -> deterministic global shuffle of the train split
    -> per-source data card for the shipped dataset

Runnable:

    python examples/select_training_data.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.dedup import near_dup_groups, ngram_jaccard_pairs
from parqueryd_spark.operators.quality import data_card
from parqueryd_spark.operators.sampling import group_aware_split, seeded_shuffle
from parqueryd_spark.operators.similarity import prototype_scores, semantic_dedup
from parqueryd_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("select-training-data")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. SemDeDup: drop embedding-space near-duplicates (paraphrases/templates
    # that exact and n-gram dedup cannot see), keeping the least-prototypical
    # member of every duplicate group.
    sem = semantic_dedup(emb, threshold=0.45, n_centroids=8).persist()
    kept_vecs = sem.filter(F.col("keep"))
    n_emb, n_kept = emb.count(), kept_vecs.count()

    # 2. Prototypicality pruning: with abundant data, drop the most
    # prototypical (easiest) quartile of each cluster — the Sorscher et al.
    # scaling-beating pruning direction.
    proto = prototype_scores(emb, n_centroids=8)
    hard = proto.filter(F.col("proto_rank") > F.col("cluster_n") * F.lit(0.25))
    pruned = kept_vecs.join(hard.select("vec_id"), "vec_id", "left_semi")
    n_pruned = pruned.count()

    # 3. Leakage-safe split of the DOCUMENT corpus: near-dup groups are the
    # split unit, so eval can never hold a near-copy of a training document.
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    groups = near_dup_groups(pairs).persist()
    split = group_aware_split(
        docs, "doc_id", groups, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="r6"
    ).persist()
    leak = (
        split.join(groups, "doc_id")
        .groupBy("group_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leak == 0, "a near-dup group straddles two splits"

    # 4. Deterministic global shuffle of the train split — the order training
    # loaders will consume, byte-identical on every re-run.
    train = split.filter(F.col("split") == "train")
    shuffled = seeded_shuffle(train, "doc_id", salt="r6", n_output_partitions=4)
    n_train = shuffled.count()
    assert shuffled.agg(F.max("shuffle_rank")).first()[0] == n_train

    # 5. The data card that ships with the published dataset.
    card = data_card(train, "text")

    print(f"embeddings: {n_emb} -> {n_kept} after SemDeDup -> {n_pruned} after pruning")
    print(f"documents:  train={n_train} of {docs.count()}, 0 groups leak across splits")
    for r in card.orderBy("source").collect():
        print(
            f"  {r.source}: {r.n_docs} docs, {r.n_tokens} tokens, "
            f"dup {r.dup_pct:.2%}, quality {r.avg_quality:.3f}, "
            f"pii {r.docs_with_pii}, langs {r.n_langs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
