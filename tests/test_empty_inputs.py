"""Empty-input robustness: every custom operator must return an empty result
(not crash) on an empty table — the shape every operator hits at 100 TB when a
partition filter eliminates all data."""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from parqueryd_spark.operators.multimodal import extract_features, media_from_documents
from parqueryd_spark.operators.relational import asof_join, topk
from parqueryd_spark.operators.scale import salted_groupby_agg
from parqueryd_spark.operators.similarity import brute_force_topk, cosine_near_dup_pairs
from parqueryd_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _empty_docs(spark):
    return load_table(spark, SF_SMOKE, "documents").filter(F.lit(False))


def test_dedup_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert exact_dedup(docs, "text", "doc_id").count() == 0
    assert ngram_jaccard_pairs(docs, "doc_id", "text").count() == 0
    assert minhash_lsh_pairs(docs, "doc_id", "text").count() == 0
    assert simhash_near_pairs(docs, "doc_id", "text").count() == 0


def test_similarity_ops_on_empty(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").filter(F.lit(False))
    assert cosine_near_dup_pairs(emb).count() == 0
    assert brute_force_topk(emb, emb, k=3).count() == 0


def test_relational_ops_on_empty(spark):
    orders = load_table(spark, SF_SMOKE, "orders").filter(F.lit(False))
    assert topk(orders, [F.col("o_totalprice").desc()], 5).count() == 0
    assert salted_groupby_agg(orders, ["o_orderstatus"], {"n": ("o_orderkey", "count")}).count() == 0
    ev = load_table(spark, SF_SMOKE, "events").filter(F.lit(False))
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", "ts", "value")
    assert asof_join(left, right, ["user_id"], "ts", "ts", right_cols=["value"]).count() == 0


def test_multimodal_on_empty(spark):
    feats = extract_features(media_from_documents(_empty_docs(spark)))
    assert feats.count() == 0
    assert len(feats.schema.fields) == 7
