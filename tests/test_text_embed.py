"""Feature-hashing embedder (operators/text.py:hash_embed): determinism,
hand-computed bucket/sign arithmetic, empty-document zero vectors, and the
end-to-end text → embed → ANN-index composition. The cross-engine value
check runs in test_registry_oracle via text_hash_embeddings."""

from __future__ import annotations

import hashlib

from parqueryd_spark.operators.text import hash_embed


def _expected_vec(text: str, dim: int = 16, salt: str = "embed"):
    v = [0.0] * dim
    for tok in text.split(" "):
        if not tok:
            continue
        h = hashlib.md5((tok + salt).encode()).hexdigest()
        b = int(h[:8], 16) % dim
        s = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
        v[b] += s
    return v


def test_matches_hand_computed_hash_arithmetic(spark):
    rows = [(1, "the quick brown fox"), (2, "jumps over the lazy dog"), (3, "the the the")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: list(r["embedding"]) for r in hash_embed(df, "doc_id", "text").collect()}
    for i, text in rows:
        assert got[i] == _expected_vec(text), (i, text)


def test_empty_and_whitespace_docs_keep_zero_vectors(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: list(r["embedding"]) for r in hash_embed(df, "doc_id", "text", dim=8).collect()}
    assert got[1] == [0.0] * 8 and got[2] == [0.0] * 8
    assert sum(abs(x) for x in got[3]) == 1.0


def test_embed_feeds_the_ann_index_end_to_end(spark, tmp_path):
    """documents → hash_embed → ivfsq_publish → search: the training-free
    pipeline composes (near-duplicate texts rank each other first)."""
    from parqueryd_spark.operators.squant import ivfsq_load, ivfsq_publish, ivfsq_search

    base = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red green blue yellow purple orange",
        "north south east west up down",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t + " extra"))  # near-duplicate partner
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    emb = hash_embed(docs, "doc_id", "text", dim=16).withColumnRenamed("doc_id", "vec_id")
    idx = str(tmp_path / "txt_idx")
    ivfsq_publish(spark, idx, emb, dim=16, centroids="first_k", n_centroids=2)
    codes, cents, lo, step = ivfsq_load(spark, idx)
    got = ivfsq_search(codes, cents, lo, step, emb, corpus=emb, nprobe=2, k=1, refine=2)
    top1 = {r["query_id"]: r["neighbor_id"] for r in got.collect()}
    hits = sum(1 for q, n in top1.items() if n == q ^ 1)  # partner id flips the low bit
    assert hits >= 6, f"only {hits}/8 queries ranked their near-duplicate first: {top1}"
