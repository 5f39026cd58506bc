"""Bigram-LM quality scoring (operators/lm.py, streaming/lm.py): the score
arithmetic is pinned to hand-computed values, training is linear (merge of
corpus splits equals one-shot training bit-exactly), held-out documents take
the unseen-gram smoothing path, and the streaming maintenance face
merge-on-reads to the batch answer."""

from __future__ import annotations

import math
import os

import pandas as pd

from parqueryd_spark.operators.lm import bigram_counts, lm_merge, lm_score, lm_train
from parqueryd_spark.streaming.lm import read_lm, stream_maintain_lm, stream_score_documents

DOCS = [
    (1, "a b a b"),
    (2, "a b c"),
    (3, "x"),  # 1 token: no bigrams, absent from scores
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hand_nll(grams: list[tuple[str, int]], counts, contexts, vsz, k=0.5):
    total = sum(w for _, w in grams)
    s = 0.0
    for g, w in grams:
        prev = " ".join(g.split(" ")[:-1])  # context = all but the final token
        c = counts.get(g, 0)
        cc = contexts.get(prev, 0)
        s += w * math.log2((c + k) / (cc + k * vsz))
    return round(-s / total, 6)


def test_score_matches_hand_arithmetic(spark):
    lm = lm_train(_docs(spark, DOCS))
    out = {r["doc_id"]: r for r in lm_score(_docs(spark, DOCS), "doc_id", lm).collect()}
    counts = {"a b": 3, "b a": 1, "b c": 1}
    contexts = {"a": 3, "b": 2}
    vsz = 4  # distinct second tokens {a,b,c} + 1 OOV
    assert sorted((r["gram"], r["c"]) for r in lm.bigrams.collect()) == sorted(counts.items())
    assert {r["prev"]: r["cc"] for r in lm.contexts.collect()} == contexts
    assert lm.vocab.collect()[0]["vsz"] == vsz
    d1 = _hand_nll([("a b", 2), ("b a", 1)], counts, contexts, vsz)
    d2 = _hand_nll([("a b", 1), ("b c", 1)], counts, contexts, vsz)
    assert out[1]["avg_nll"] == d1 and out[2]["avg_nll"] == d2
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 2
    assert out[1]["ppl"] == round(2.0 ** d1, 4)
    assert 3 not in out  # single-token doc has nothing to score


def test_merge_of_splits_equals_one_shot(spark):
    full = _docs(spark, DOCS)
    direct = lm_train(full)
    merged = lm_merge(
        [bigram_counts(_docs(spark, DOCS[:1])), bigram_counts(_docs(spark, DOCS[1:]))]
    )
    assert sorted(map(tuple, direct.bigrams.collect())) == sorted(
        map(tuple, merged.bigrams.collect())
    )
    # scored output identical through either model
    a = sorted(map(tuple, lm_score(full, "doc_id", direct).collect()))
    b = sorted(map(tuple, lm_score(full, "doc_id", merged).collect()))
    assert a == b


def test_held_out_unseen_grams_smooth_not_crash(spark):
    lm = lm_train(_docs(spark, DOCS))
    held = _docs(spark, [(9, "z q z")])  # every gram and context unseen
    row = lm_score(held, "doc_id", lm).collect()[0]
    # unseen gram, unseen context: P = k / (0 + k*V) = 1/V -> nll = log2(V)
    assert row["avg_nll"] == round(math.log2(4), 6)
    assert row["n_bigrams"] == 2


def test_in_distribution_scores_below_garbage(spark):
    corpus = [(i, "the cat sat on the mat") for i in range(20)]
    lm = lm_train(_docs(spark, corpus))
    probe = _docs(spark, [(1, "the cat sat on the mat"), (2, "mat the on cat sat the")])
    out = {r["doc_id"]: r["ppl"] for r in lm_score(probe, "doc_id", lm).collect()}
    assert out[1] < out[2]


def test_stream_maintain_merges_to_batch_lm_and_scores(spark, tmp_path):
    stream_in = str(tmp_path / "in")
    lm_dir = str(tmp_path / "lm")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)
    pd.DataFrame(DOCS[:1], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame(DOCS[1:], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = "doc_id bigint, text string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_maintain_lm(stream, lm_dir, ckpt).awaitTermination()

    served = read_lm(spark, lm_dir)
    direct = lm_train(_docs(spark, DOCS))
    assert sorted(map(tuple, served.bigrams.collect())) == sorted(
        map(tuple, direct.bigrams.collect())
    )

    # frozen-model streaming scorer == batch scorer row-for-row
    scores_dir = str(tmp_path / "scores")
    ckpt2 = str(tmp_path / "ckpt2")
    stream2 = spark.readStream.schema(schema).parquet(stream_in)
    stream_score_documents(stream2, served, scores_dir, ckpt2).awaitTermination()
    streamed = sorted(map(tuple, spark.read.parquet(scores_dir).drop("batch").collect()))
    batch = sorted(map(tuple, lm_score(_docs(spark, DOCS), "doc_id", direct).collect()))
    assert streamed == batch


def test_publish_append_load_equals_one_shot(spark, tmp_path):
    from parqueryd_spark.operators.lm import lm_append, lm_load, lm_publish

    lm_dir = str(tmp_path / "lm_pub")
    lm_publish(spark, lm_dir, _docs(spark, DOCS[:1]))
    lm_append(spark, lm_dir, _docs(spark, DOCS[1:]), batch="b1")
    served = lm_load(spark, lm_dir)
    direct = lm_train(_docs(spark, DOCS))
    assert sorted(map(tuple, served.bigrams.collect())) == sorted(
        map(tuple, direct.bigrams.collect())
    )
    scored = lm_score(_docs(spark, DOCS), "doc_id", served)
    direct_scored = lm_score(_docs(spark, DOCS), "doc_id", direct)
    assert sorted(map(tuple, scored.collect())) == sorted(map(tuple, direct_scored.collect()))

    # replay: re-appending the same batch must not double-count (reload after
    # the overwrite — the pre-replay `served` plan points at replaced files)
    lm_append(spark, lm_dir, _docs(spark, DOCS[1:]), batch="b1")
    again = lm_load(spark, lm_dir)
    assert sorted(map(tuple, again.bigrams.collect())) == sorted(
        map(tuple, direct.bigrams.collect())
    )


def test_trigram_order_matches_hand_arithmetic(spark):
    from parqueryd_spark.operators.lm import lm_train

    corpus = _docs(spark, [(1, "a b c a b c"), (2, "a b d")])
    lm = lm_train(corpus, n=3)
    # trigrams: doc1: 'a b c','b c a','c a b','a b c'; doc2: 'a b d'
    counts = {"a b c": 2, "b c a": 1, "c a b": 1, "a b d": 1}
    contexts = {"a b": 3, "b c": 1, "c a": 1}
    vsz = 5  # distinct final tokens {c,a,b,d} + 1
    assert sorted((r["gram"], r["c"]) for r in lm.bigrams.collect()) == sorted(counts.items())
    assert {r["prev"]: r["cc"] for r in lm.contexts.collect()} == contexts
    assert lm.vocab.collect()[0]["vsz"] == vsz
    out = {r["doc_id"]: r for r in lm_score(corpus, "doc_id", lm).collect()}
    d2 = _hand_nll([("a b d", 1)], counts, contexts, vsz)
    assert out[2]["avg_nll"] == d2
    assert out[2]["n_bigrams"] == 1
    # a 2-token doc has no trigrams
    short = lm_score(_docs(spark, [(7, "a b")]), "doc_id", lm)
    assert short.count() == 0


def test_trigram_publish_append_respects_persisted_order(spark, tmp_path):
    from parqueryd_spark.operators.lm import lm_append, lm_load, lm_publish, lm_train

    corpus = [(1, "a b c a b c"), (2, "a b d")]
    lm_dir = str(tmp_path / "lm3")
    lm_publish(spark, lm_dir, _docs(spark, corpus[:1]), n=3)
    lm_append(spark, lm_dir, _docs(spark, corpus[1:]), batch="b1")
    served = lm_load(spark, lm_dir)
    assert served.n == 3
    direct = lm_train(_docs(spark, corpus), n=3)
    assert sorted(map(tuple, served.bigrams.collect())) == sorted(
        map(tuple, direct.bigrams.collect())
    )
