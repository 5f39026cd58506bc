"""Text → vectors → compressed ANN serving, with nothing but the engine:

    embed:   hash_embed turns raw documents into dense vectors with one md5
             per token — no model, no Python UDF, exactly reproducible
    index:   ivfsq_publish buckets the vectors under coarse centroids and
             stores 1-byte-per-dim SQ8 codes partitioned by
             (batch, centroid_id)
    grow:    stream_embed_into_ivfsq embeds each arriving micro-batch and
             appends it against the FROZEN quantizers — O(batch) per trigger
    serve:   ivfsq_search probes nprobe buckets (dynamic partition pruning),
             scores codes with a JVM fold, exactly re-ranks the shortlist

Runnable:

    python examples/text_to_vectors.py [sf_dir]   # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.squant import ivfsq_load, ivfsq_publish, ivfsq_search
from parqueryd_spark.operators.text import hash_embed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("text-to-vectors")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print(f"corpus: {docs.count()} documents")

    # 1. embed — integer-valued feature-hashing vectors, dim=32
    emb = hash_embed(docs, "doc_id", "text", dim=32).withColumnRenamed(
        "doc_id", "vec_id"
    )
    print("embedded:", emb.select(F.size("embedding").alias("d")).first()["d"], "dims")

    # 2. publish the IVF-SQ index (coarse buckets + SQ8 codes + frozen grid)
    idx = tempfile.mkdtemp(prefix="text_vec_idx_")
    ivfsq_publish(spark, idx, emb, dim=32, centroids="first_k", n_centroids=8)
    codes, cents, lo, step = ivfsq_load(spark, idx)
    print(f"published: {codes.count()} code rows across "
          f"{cents.count()} buckets at {idx}")

    # 3. serve — each query probes 3 of 8 buckets, exact re-rank of 3x5
    queries = emb.orderBy("vec_id").limit(4)
    hits = ivfsq_search(
        codes, cents, lo, step, queries, corpus=emb, nprobe=3, k=5, refine=3
    )
    hits.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
