"""Sketch/quantization registry rows (past the 50-row gate window by design —
both produce engine-specific estimates; each is error/recall-bounded against
its exact twin in pytest, and the exact pipelines are the externally-oracled
anchors: `ann_bruteforce_topk` in-window for PQ, `text_ngram_stats`'s
frequency branch for the heavy-hitter sketch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table


@query("ann_pq_topk", oracle=None)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat PQ with ADC shortlist + exact re-rank (operators/quantization.py):
    16 subspaces × 16 codes compress each 64-dim float vector to 16 bytes
    (16× vs float32, 32× vs float64); search touches only codes until the
    refine×k shortlist is exactly re-ranked. The 100 TB memory tier below IVF
    bucket pruning. Deterministic: seeded sample training, first-min
    tie-breaks, neighbor-id-ordered windows."""
    from parqueryd_spark.operators.quantization import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.orderBy("vec_id").limit(8)
    return pq_topk(emb, queries_df, dim=64, k=5).orderBy("query_id", "rank")


@query("text_heavy_hitter_tokens", oracle=None)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (operators/sketches.py) over the corpus's
    token stream: top-20 most frequent tokens from bounded per-partition
    counters + one tiny merge shuffle, instead of shuffling every token
    occurrence. est_count <= true <= est_count + max_undercount is part of
    the result. Rows-only row (sketch estimates are engine-specific); the
    bound and exact-top-k agreement are asserted in tests/test_sketches.py,
    and the exact token-frequency pipeline is oracled in-window via
    text_ngram_stats' bigram branch."""
    from parqueryd_spark.operators import text as T
    from parqueryd_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    return heavy_hitters(toks, "token", k=20, capacity=1024)
