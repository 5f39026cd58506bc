"""Product-quantization ANN registry row (past the 50-row gate window by
design — ANN rankings are engine-specific estimates; recall vs the exact
brute-force baseline is asserted in tests/test_quantization.py, and the
in-window `ann_bruteforce_topk` row is the externally-oracled anchor)."""

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
