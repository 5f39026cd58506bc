"""The searchable-corpus lifecycle end to end:

    1. publish an inverted BM25 index for the current corpus
    2. serve a query from the index (partition-pruned bucket reads) and
       verify it matches the corpus-scan score exactly
    3. append a daily increment (new batch partition, nothing rewritten)
    4. drain a document stream into the same index (idempotent per-batch
       partitions; composes downstream of streaming near-dedup)
    5. compact the accumulated generations and serve again

Runnable:

    python examples/text_search.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.text import (
    bm25_from_index,
    bm25_scores,
    text_index_append,
    text_index_publish,
)
from parqueryd_spark.sources.parquet import load_table
from parqueryd_spark.streaming.search import compact_text_index, stream_index_text

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TERMS = ["hash", "join", "vector"]


def main() -> None:
    spark = get_spark("text-search-example")
    docs = load_table(spark, SF_DIR, "documents")
    base = docs.where(F.col("doc_id") < 150)
    increment = docs.where((F.col("doc_id") >= 150) & (F.col("doc_id") < 200))
    late = docs.where(F.col("doc_id") >= 200)

    with tempfile.TemporaryDirectory() as tmp:
        index_dir = os.path.join(tmp, "index")

        # 1. publish
        text_index_publish(base, index_dir, "doc_id", "text")
        print(f"published index for {base.count()} docs")

        # 2. serve == scan
        served = bm25_from_index(spark, index_dir, TERMS)
        top = served.orderBy(F.desc("score")).limit(5).collect()
        print("top-5 from index:", [(r["doc"], round(r["score"], 4)) for r in top])
        scan = bm25_scores(base, "doc_id", "text", TERMS)
        assert sorted(
            (r["doc"], round(r["score"], 9)) for r in served.collect()
        ) == sorted((r["doc"], round(r["score"], 9)) for r in scan.collect())
        print("index serve matches corpus scan")

        # 3. daily append
        text_index_append(spark, index_dir, increment, "doc_id", "text")
        print(f"appended {increment.count()} docs as a new batch partition")

        # 4. stream the rest in
        stream_in = os.path.join(tmp, "in")
        os.makedirs(stream_in)
        # deterministic, id-disjoint batches (the index precondition): an
        # unordered limit() could overlap b2 or skip docs entirely
        late.where(F.col("doc_id") < 220).toPandas().to_parquet(
            os.path.join(stream_in, "b1.parquet")
        )
        time.sleep(1.0)
        late.where(F.col("doc_id") >= 220).toPandas().to_parquet(
            os.path.join(stream_in, "b2.parquet")
        )
        schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )
        stream_index_text(
            stream, index_dir, os.path.join(tmp, "ckpt")
        ).awaitTermination()
        print("stream drained into the index")

        # 5. compact + final serve over everything
        n = compact_text_index(spark, index_dir)
        print(f"compacted to one generation ({n} postings)")
        final = bm25_from_index(spark, index_dir, TERMS)
        full = docs  # base + increment + streamed
        assert sorted(
            (r["doc"], round(r["score"], 9)) for r in final.collect()
        ) == sorted(
            (r["doc"], round(r["score"], 9))
            for r in bm25_scores(full, "doc_id", "text", TERMS).collect()
        )
        print(f"final index serves {final.count()} matching docs == full-corpus scan")

    spark.stop()


if __name__ == "__main__":
    main()
