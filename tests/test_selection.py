"""Behavioral tests for the data-selection operators added in round 6:
semantic dedup (SemDeDup), prototypicality pruning, leakage-safe splits,
deterministic global shuffle, and winnowing-overlap pairs — the oracle SQL
checks live in test_registry_oracle; these assert the operator CONTRACTS
(group invariants, permutation properties, boilerplate caps) that a value
hash alone does not pin down."""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.sampling import group_aware_split, seeded_shuffle
from parqueryd_spark.operators.similarity import prototype_scores, semantic_dedup
from parqueryd_spark.operators.text import winnow_overlap_pairs
from parqueryd_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_semantic_dedup_group_invariants(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = semantic_dedup(emb, threshold=0.45, n_centroids=8).persist()
    n = emb.count()
    assert out.count() == n  # one row per vector, none dropped or duplicated
    assert out.select("vec_id").distinct().count() == n
    # exactly one keeper per group
    per_group = out.groupBy("group_id").agg(
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.count_distinct("centroid_id").alias("n_cen"),
    )
    assert per_group.filter(F.col("kept") != 1).count() == 0
    # edges never cross clusters => a group lives inside one cluster
    assert per_group.filter(F.col("n_cen") != 1).count() == 0
    # the kept member is the least centroid-similar of its group
    grouped = out.groupBy("group_id").agg(
        F.min("centroid_sim").alias("min_sim"), F.count(F.lit(1)).alias("sz")
    )
    kept = out.filter(F.col("keep")).select("group_id", "centroid_sim")
    bad = (
        kept.join(grouped, "group_id")
        .filter((F.col("sz") > 1) & (F.col("centroid_sim") != F.col("min_sim")))
        .count()
    )
    assert bad == 0
    out.unpersist()


def test_semantic_dedup_kmeans_mode_runs(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(60)
    out = semantic_dedup(emb, threshold=0.45, n_centroids=4, centroid_mode="kmeans")
    assert out.count() == 60


def test_prototype_scores_rank_contract(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    scores = prototype_scores(emb, n_centroids=8).persist()
    # ranks are a 1..cluster_n permutation inside each cluster
    per = scores.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("proto_rank").alias("lo"),
        F.max("proto_rank").alias("hi"),
        F.count_distinct("proto_rank").alias("d"),
        F.max("cluster_n").alias("cn"),
        F.min("cluster_n").alias("cn2"),
    )
    bad = per.filter(
        (F.col("lo") != 1)
        | (F.col("hi") != F.col("n"))
        | (F.col("d") != F.col("n"))
        | (F.col("cn") != F.col("n"))
        | (F.col("cn2") != F.col("n"))
    )
    assert bad.count() == 0
    assert scores.count() == n
    # rank order follows centroid similarity (non-increasing along rank)
    from pyspark.sql import Window as W

    w = W.partitionBy("centroid_id").orderBy("proto_rank")
    mono = scores.withColumn("prev", F.lag("centroid_sim").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("centroid_sim") > F.col("prev"))
    )
    assert mono.count() == 0
    scores.unpersist()


def test_group_aware_split_never_splits_a_group(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    from parqueryd_spark.operators.dedup import near_dup_groups, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    groups = near_dup_groups(pairs).persist()
    assert groups.count() > 0  # fixture corpus has implanted near-dups
    split = group_aware_split(
        docs, "doc_id", groups, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="t"
    )
    spans = (
        split.join(groups, "doc_id")
        .groupBy("group_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert spans.count() == 0
    # a plain per-row split on the same corpus DOES split at least one group
    # (the leak this operator exists to prevent)
    from parqueryd_spark.operators.sampling import hash_split

    naive = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="t")
    leaked = (
        naive.join(groups, "doc_id")
        .groupBy("group_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert leaked.count() > 0
    groups.unpersist()


def test_seeded_shuffle_is_a_deterministic_permutation(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    a = seeded_shuffle(docs, "doc_id", salt="s1", n_output_partitions=5).persist()
    # dense permutation 1..n
    stats = a.agg(
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
        F.count_distinct("shuffle_rank").alias("d"),
    ).first()
    assert (stats["lo"], stats["hi"], stats["d"]) == (1, n, n)
    # deterministic across runs; different salt gives a different order
    b = seeded_shuffle(docs, "doc_id", salt="s1", n_output_partitions=5)
    assert a.exceptAll(b).count() == 0
    c = seeded_shuffle(docs, "doc_id", salt="s2", n_output_partitions=5)
    assert a.exceptAll(c).count() > 0
    # rank is independent of the partition count (the offset lift is exact)
    d = seeded_shuffle(docs, "doc_id", salt="s1", n_output_partitions=2)
    assert a.exceptAll(d).count() == 0
    a.unpersist()


def test_winnow_overlap_xxhash_and_max_df(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    fast = winnow_overlap_pairs(docs, min_common=5, hash_mode="xxhash").persist()
    slow = winnow_overlap_pairs(docs, min_common=5, hash_mode="md5")
    # both hash variants flag the same document pairs (counts may differ only
    # if hash collisions differ; the pair sets over this corpus agree)
    fp = {(r["id_a"], r["id_b"]) for r in fast.select("id_a", "id_b").collect()}
    sp = {(r["id_a"], r["id_b"]) for r in slow.select("id_a", "id_b").collect()}
    assert fp == sp and fp
    # near-dup jaccard pairs all share winnow fingerprints (winnowing
    # guarantees shared fingerprints for long shared runs; short documents
    # may have fewer than 5 fingerprints total, so assert at min_common=1)
    from parqueryd_spark.operators.dedup import ngram_jaccard_pairs

    jp = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
        .select("id_a", "id_b")
        .collect()
    }
    loose = winnow_overlap_pairs(docs, min_common=1, hash_mode="xxhash")
    lp = {(r["id_a"], r["id_b"]) for r in loose.select("id_a", "id_b").collect()}
    assert jp <= lp
    # a max_df boilerplate cap can only remove evidence, never add pairs
    capped = winnow_overlap_pairs(docs, min_common=5, hash_mode="xxhash", max_df=2)
    cp = {(r["id_a"], r["id_b"]) for r in capped.select("id_a", "id_b").collect()}
    assert cp <= fp
    fast.unpersist()


def test_data_card_invariants(spark):
    from parqueryd_spark.operators.quality import data_card

    docs = load_table(spark, SF_SMOKE, "documents")
    card = data_card(docs).persist()
    rows = {r["source"]: r for r in card.collect()}
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    for r in rows.values():
        assert 0 <= r["dup_pct"] <= 1
        assert r["n_unique_texts"] <= r["n_docs"]
        assert 0 <= r["docs_with_pii"] <= r["n_docs"]
        assert 1 <= r["n_langs"]
        assert r["n_tokens"] >= r["n_docs"]  # every doc has at least one token
    card.unpersist()


def test_margin_match_contract(spark):
    from parqueryd_spark.operators.similarity import brute_force_topk, margin_topk_match

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    m = margin_topk_match(emb, qs, k=4, margin_threshold=0.0).persist()
    assert m.count() == 10  # distance margin is always >= 0, so all queries pass
    # the accepted neighbor IS the exact top-1
    top1 = brute_force_topk(emb, qs, k=1).select("query_id", "neighbor_id")
    assert m.select("query_id", "neighbor_id").exceptAll(top1).count() == 0
    # raising the threshold can only shrink the match set
    strict = margin_topk_match(emb, qs, k=4, margin_threshold=0.15)
    assert strict.count() <= 10
    strict_ids = {r["query_id"] for r in strict.select("query_id").collect()}
    loose_ids = {r["query_id"] for r in m.select("query_id").collect()}
    assert strict_ids <= loose_ids
    m.unpersist()


def test_margin_match_negative_neighborhood(spark):
    """The distance margin must ACCEPT an outlier query whose one real match
    towers over an otherwise-dissimilar (negative-cosine) neighborhood — the
    case where the ratio variant flips sign and rejects it."""
    from parqueryd_spark.operators.similarity import margin_topk_match

    rows = [
        (0, [1.0, 0.0, 0.0]),     # query
        (1, [1.0, 0.01, 0.0]),    # its real near-match
        (2, [-1.0, 0.0, 0.0]),    # everything else: opposite direction
        (3, [-1.0, 0.1, 0.0]),
        (4, [0.0, -1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    got = margin_topk_match(df, q, k=4, margin_threshold=0.5).collect()
    assert len(got) == 1 and got[0]["neighbor_id"] == 1
    # ratio mode documents the restriction and indeed rejects this shape
    ratio = margin_topk_match(df, q, k=4, margin_threshold=1.0, margin_mode="ratio")
    assert ratio.count() == 0


def test_seeded_shuffle_dense_at_scale(spark):
    """300k rows across uneven input partitions: the rank must be a dense
    1..n permutation — this is the scale at which re-sampled range boundaries
    between the count pass and the rank pass would corrupt the composition
    if the shuffled layout were not frozen first."""
    from parqueryd_spark.operators.sampling import seeded_shuffle

    n = 300_000
    df = spark.range(n).repartition(8).select(F.col("id").alias("k"))
    out = seeded_shuffle(df, "k", salt="big", n_output_partitions=6)
    stats = out.agg(
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
        F.count_distinct("shuffle_rank").alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert (stats["lo"], stats["hi"], stats["d"], stats["n"]) == (1, n, n, n)


def test_unigram_divergence_properties(spark):
    from parqueryd_spark.operators.text import unigram_divergence

    docs = load_table(spark, SF_SMOKE, "documents")
    div = unigram_divergence(docs, "source").persist()
    rows = div.collect()
    assert len(rows) == docs.select("source").distinct().count()
    # KL is non-negative, and token totals reconcile with the corpus
    assert all(r["kl_divergence"] >= 0 for r in rows)
    total = sum(r["n_tokens"] for r in rows)
    from parqueryd_spark.operators.text import token_count

    assert total == docs.select(F.sum(token_count("text"))).first()[0]
    # a single-group corpus diverges from itself by exactly zero
    one = unigram_divergence(docs.withColumn("source", F.lit("all")), "source")
    assert one.first()["kl_divergence"] == 0.0
    div.unpersist()


def test_temperature_targets(spark):
    from parqueryd_spark.operators.sampling import (
        mixture_fractions,
        resample_to_mixture,
        temperature_targets,
    )

    counts = {"big": 1000, "mid": 100, "small": 10}
    nat = temperature_targets(counts, alpha=1.0)
    assert abs(nat["big"] - 1000 / 1110) < 1e-12  # alpha=1 = natural mix
    uni = temperature_targets(counts, alpha=0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in uni.values())  # alpha=0 = uniform
    mid = temperature_targets(counts, alpha=0.5)
    # temperature compresses the ratio monotonically between the extremes
    assert nat["big"] > mid["big"] > uni["big"]
    assert nat["small"] < mid["small"] < uni["small"]
    assert abs(sum(mid.values()) - 1.0) < 1e-12
    # composes with the no-upsampling fraction solver: every fraction <= 1
    fracs = mixture_fractions(counts, mid)
    assert all(0 < f <= 1.0 + 1e-12 for f in fracs.values())
    # and end-to-end: the resampled corpus approaches the temperature mix
    docs = load_table(spark, SF_SMOKE, "documents")
    dcounts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    targets = temperature_targets(dcounts, alpha=0.5)
    out = resample_to_mixture(docs, "source", targets, "doc_id", salt="temp")
    assert 0 < out.count() <= docs.count()


def test_seeded_shuffle_curriculum_stages(spark):
    """With curriculum columns, every stage's ranks precede the next stage's,
    and within a stage the order is the same md5 shuffle."""
    from parqueryd_spark.operators.sampling import seeded_shuffle

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    out = seeded_shuffle(
        docs, "doc_id", salt="cur", n_output_partitions=4, curriculum_cols=["lang"]
    ).persist()
    n = docs.count()
    stats = out.agg(
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
        F.count_distinct("shuffle_rank").alias("d"),
    ).first()
    assert (stats["lo"], stats["hi"], stats["d"]) == (1, n, n)
    stages = (
        out.groupBy("lang")
        .agg(F.min("shuffle_rank").alias("lo"), F.max("shuffle_rank").alias("hi"))
        .orderBy("lang")
        .collect()
    )
    assert len(stages) >= 2  # fixture corpus has several langs
    for prev, nxt in zip(stages, stages[1:]):
        assert prev["hi"] < nxt["lo"]  # stage ranges never interleave
    # within a stage, relative order equals the stage-restricted plain shuffle
    lang0 = stages[0]["lang"]
    within = seeded_shuffle(
        docs.filter(F.col("lang") == lang0), "doc_id", salt="cur", n_output_partitions=4
    )
    a = [r["doc_id"] for r in out.filter(F.col("lang") == lang0).orderBy("shuffle_rank").collect()]
    b = [r["doc_id"] for r in within.orderBy("shuffle_rank").collect()]
    assert a == b
    out.unpersist()


def test_group_aware_split_guards_inputs(spark):
    """ADVICE r6: reserved internal columns must raise, and duplicate doc_id
    rows in the groups mapping must not fan out corpus rows."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    groups = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "doc_id long, group_id long"
    )
    out = group_aware_split(docs, "doc_id", groups, {"train": 0.5, "val": 0.5})
    assert out.count() == docs.count()  # dupes collapsed, no fan-out
    assert set(out.columns) == {"doc_id", "text", "split"}

    clash = docs.withColumn("_gkey", F.lit(0))
    with pytest.raises(ValueError, match="_gkey"):
        group_aware_split(clash, "doc_id", groups, {"train": 0.5, "val": 0.5})
