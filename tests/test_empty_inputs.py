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


def test_curation_ops_on_empty(spark):
    from parqueryd_spark.operators.analytics import cohort_retention, funnel_summary
    from parqueryd_spark.operators.dedup import span_dedup
    from parqueryd_spark.operators.pii import redact_pii
    from parqueryd_spark.operators.sampling import chunk_documents
    from parqueryd_spark.operators.text import unigram_logprob

    docs = _empty_docs(spark)
    assert span_dedup(docs, "doc_id", "text", span_tokens=3).count() == 0
    assert chunk_documents(docs, "doc_id", "text").count() == 0
    assert unigram_logprob(docs, "doc_id", "text").count() == 0
    assert docs.select(redact_pii("text")).count() == 0
    ev = load_table(spark, SF_SMOKE, "events").filter(F.lit(False))
    assert funnel_summary(ev, ["view", "click"]).count() == 0
    assert cohort_retention(ev).count() == 0


def test_quality_checks_on_empty(spark):
    from parqueryd_spark.operators.quality import (
        check_foreign_key,
        check_not_null,
        check_range,
        check_unique,
        quality_report,
        table_stats,
    )

    docs = _empty_docs(spark)
    rep = quality_report(
        [
            check_unique(docs, ["doc_id"]),
            check_not_null(docs, ["doc_id"]),
            check_range(docs, "n_chars", 0, 10**9),
            check_foreign_key(docs, "doc_id", docs, "doc_id"),
        ]
    ).collect()
    # an empty table violates nothing
    assert all(r.passed and r.violations == 0 for r in rep)
    stats = {r.column: r for r in table_stats(docs, ["doc_id"]).collect()}
    assert stats["doc_id"].n_rows == 0 and stats["doc_id"].n_distinct == 0


def test_upsert_with_empty_updates(spark, tmp_path):
    import os

    from parqueryd_spark.sources.sinks import upsert_parquet, upsert_partitioned

    p = os.path.join(str(tmp_path), "tbl")
    base = spark.createDataFrame([(1, "d1", "a")], "k long, day string, v string")
    base.write.parquet(p)
    empty = base.filter(F.lit(False))
    upsert_parquet(spark, p, empty, ["k"])
    assert spark.read.parquet(p).count() == 1

    pp = os.path.join(str(tmp_path), "ptbl")
    base.write.partitionBy("day").parquet(pp)
    assert upsert_partitioned(spark, pp, empty, ["k"], "day") == []
    assert spark.read.parquet(pp).count() == 1


def test_round6_late_ops_on_empty(spark):
    from parqueryd_spark.operators.quality import compression_ratio, table_diff
    from parqueryd_spark.operators.sampling import cap_per_group
    from parqueryd_spark.operators.text import bm25_scores

    docs = _empty_docs(spark)
    assert bm25_scores(docs, "doc_id", "text", ["hash"]).count() == 0
    assert compression_ratio(docs, "doc_id", "text").count() == 0
    assert (
        cap_per_group(docs, ["source"], 3, [F.col("doc_id").asc()]).count() == 0
    )
    full = load_table(spark, SF_SMOKE, "documents")
    # empty vs empty, and empty vs full (everything 'added' / 'removed')
    assert table_diff(docs, docs, ["doc_id"]).count() == 0
    n = full.count()
    added = table_diff(docs, full, ["doc_id"])
    assert added.count() == n and added.where(F.col("status") != "added").count() == 0
    removed = table_diff(full, docs, ["doc_id"])
    assert removed.count() == n and removed.where(F.col("status") != "removed").count() == 0


def test_selection_ops_on_empty(spark):
    from parqueryd_spark.operators.sampling import group_aware_split, seeded_shuffle
    from parqueryd_spark.operators.similarity import prototype_scores, semantic_dedup
    from parqueryd_spark.operators.text import winnow_overlap_pairs

    docs = _empty_docs(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings").filter(F.lit(False))
    assert semantic_dedup(emb, threshold=0.45, n_centroids=4).count() == 0
    assert prototype_scores(emb, n_centroids=4).count() == 0
    assert winnow_overlap_pairs(docs).count() == 0
    assert winnow_overlap_pairs(docs, max_df=3).count() == 0
    empty_groups = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("group_id")
    )
    split = group_aware_split(
        docs, "doc_id", empty_groups, {"train": 0.9, "test": 0.1}
    )
    assert split.count() == 0 and "split" in split.columns
    shuffled = seeded_shuffle(docs.select("doc_id"), "doc_id", n_output_partitions=4)
    assert shuffled.count() == 0 and "shuffle_rank" in shuffled.columns


def test_quantization_ops_on_empty(spark):
    """pq_train on an empty corpus must fail loudly (codebooks are
    meaningless), while empty QUERY sets flow through search as empty
    results — the shapes a scheduled pipeline actually hits."""
    import pytest

    from parqueryd_spark.operators.quantization import (
        ivfpq_load,
        ivfpq_publish,
        ivfpq_search,
        pq_topk,
        pq_train,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="non-empty corpus"):
        pq_train(empty, dim=64)
    assert pq_topk(emb, empty, dim=64, k=5).count() == 0
    import tempfile

    d = tempfile.mkdtemp(prefix="ivfpq_empty_")
    cents = (
        emb.orderBy(F.col("vec_id").asc())
        .limit(4)
        .select(F.col("vec_id").cast("int").alias("centroid_id"), "embedding")
    )
    ivfpq_publish(spark, d, emb, cents, dim=64, m=16, k_codes=16)
    codes, cen, cb = ivfpq_load(spark, d)
    assert ivfpq_search(codes, cen, cb, empty, corpus=emb, nprobe=2, k=5).count() == 0
