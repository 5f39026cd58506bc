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


def _py_kn(train_rows, score_rows, D=0.75):
    """Pure-Python interpolated KN bigram reference (Chen & Goodman 1999
    eq. 4.25 with the +1/+V continuation floor kn_score documents)."""
    from collections import Counter

    bg = Counter()
    for _, text in train_rows:
        t = text.split(" ")
        for i in range(len(t) - 1):
            bg[(t[i], t[i + 1])] += 1
    cc = Counter()
    n1p_fwd = Counter()
    n1p_bwd = Counter()
    for (w1, w2), c in bg.items():
        cc[w1] += c
        n1p_fwd[w1] += 1
        n1p_bwd[w2] += 1
    tt = len(bg)
    vsz = len({w2 for _, w2 in bg}) + 1
    out = {}
    for doc_id, text in score_rows:
        t = text.split(" ")
        grams = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        if not grams:
            continue
        s = 0.0
        for g in grams:
            pc = (n1p_bwd.get(g[1], 0) + 1) / (tt + vsz)
            if cc.get(g[0], 0) > 0:
                p = max(bg.get(g, 0) - D, 0) / cc[g[0]] + D * n1p_fwd[g[0]] / cc[g[0]] * pc
            else:
                p = pc
            s += math.log2(p)
        out[doc_id] = round(-s / len(grams), 6)
    return out


def test_kn_score_matches_pure_python_incl_held_out(spark):
    """kn_score vs the pure-Python KN reference, covering every smoothing
    branch: seen grams, unseen gram under a seen context (discount + backoff
    mass), unseen context (pure continuation), and a fully unseen word (the
    +1/+V floor). Also pins that KN probabilities are a proper discount:
    every scored document gets a finite avg_nll."""
    from parqueryd_spark.operators.lm import kn_score, lm_train

    train = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on a log"),
        (3, "a cat and a dog"),
    ]
    held = [
        (10, "the cat sat"),        # all seen
        (11, "the log sat"),        # unseen gram "the log", seen contexts
        (12, "mat mat mat"),        # "mat" never a context: backoff to Pc
        (13, "zebra the cat"),      # unseen word: +1/+V floor path
    ]
    lm = lm_train(_docs(spark, train))
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_score(_docs(spark, held), "doc_id", lm).collect()
    }
    want = _py_kn(train, held)
    assert set(got) == set(want)
    for doc_id, nll in want.items():
        assert math.isfinite(got[doc_id]), doc_id
        assert abs(got[doc_id] - nll) < 1e-6, (doc_id, got[doc_id], nll)


def _py_kn_n(train_rows, score_rows, n=3, D=0.75):
    """Pure-Python interpolated KN reference for ANY order n >= 2, with the
    per-order continuation tables derived from the highest-order counts the
    same way kn_score documents (lower C_k = distinct (k+1)-gram types
    grouped by length-k suffix; +1/+V floor at level 1)."""
    from collections import Counter

    raw = Counter()
    for _, text in train_rows:
        t = text.split(" ")
        for i in range(len(t) - n + 1):
            raw[tuple(t[i : i + n])] += 1
    level = {n: dict(raw)}
    for k in range(n - 1, 0, -1):
        ck = Counter()
        for key in level[k + 1]:
            ck[key[1:]] += 1
        level[k] = dict(ck)
    ctx = {}
    for k in range(2, n + 1):
        cc, nf = Counter(), Counter()
        for key, c in level[k].items():
            cc[key[:-1]] += c
            nf[key[:-1]] += 1
        ctx[k] = (cc, nf)
    tt = len(level[2])
    vsz = len({key[-1] for key in raw}) + 1
    out = {}
    for doc_id, text in score_rows:
        t = text.split(" ")
        grams = [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]
        if not grams:
            continue
        s = 0.0
        for g in grams:
            p = (level[1].get(g[-1:], 0) + 1) / (tt + vsz)
            for k in range(2, n + 1):
                gk = g[n - k :]
                cck, nfk = ctx[k]
                u = gk[:-1]
                if cck.get(u, 0) > 0:
                    p = (
                        max(level[k].get(gk, 0) - D, 0) / cck[u]
                        + D * nfk[u] / cck[u] * p
                    )
            s += math.log2(p)
        out[doc_id] = round(-s / len(grams), 6)
    return out


def test_py_kn_references_agree_at_n2():
    """The order-n reference specializes to the bigram reference at n=2 —
    ties the two independent formulations together."""
    train = [(1, "the cat sat on the mat"), (2, "a cat and a dog sat")]
    held = [(10, "the cat sat"), (11, "zebra mat sat"), (12, "mat mat")]
    assert _py_kn(train, held) == _py_kn_n(train, held, n=2)


def test_kn3_score_matches_pure_python_incl_held_out(spark):
    """Order-3 kn_score vs the pure-Python order-n KN reference, covering
    every smoothing branch: fully seen trigram, unseen trigram under a seen
    bigram context (top-level discount + backoff), unseen bigram context
    (middle-level continuation), and a fully unseen word (+1/+V floor)."""
    from parqueryd_spark.operators.lm import kn_score, lm_train

    train = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on a log"),
        (3, "a cat and a dog sat on grass"),
        (4, "the cat sat on grass"),
    ]
    held = [
        (10, "the cat sat on the mat"),   # seen trigrams
        (11, "the cat sat on a log"),     # seen pieces, some unseen trigrams
        (12, "the dog sat on grass now"), # unseen continuation word 'now'
        (13, "zebra quagga okapi train"), # fully unseen everything
        (14, "mat grass log"),            # words never in context position
    ]
    lm3 = lm_train(_docs(spark, train), n=3)
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_score(_docs(spark, held), "doc_id", lm3).collect()
    }
    want = _py_kn_n(train, held, n=3)
    assert set(got) == set(want)
    for doc_id, nll in want.items():
        assert math.isfinite(got[doc_id]), doc_id
        assert abs(got[doc_id] - nll) < 1e-6, (doc_id, got[doc_id], nll)


def test_kn5_order_is_a_parameter(spark):
    """CCNet parity: order 5 is the same call — finite scores, correct gram
    counts, and agreement with the pure-Python reference."""
    from parqueryd_spark.operators.lm import kn_score, lm_train

    train = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z w"),
        (3, "b c d e f q r s"),
    ]
    held = [(10, "a b c d e f"), (11, "q r s t u v")]
    lm5 = lm_train(_docs(spark, train), n=5)
    rows = {r["doc_id"]: r for r in kn_score(_docs(spark, held), "doc_id", lm5).collect()}
    want = _py_kn_n(train, held, n=5)
    assert rows[10]["n_bigrams"] == 2  # 6 tokens -> two 5-grams
    for doc_id in want:
        assert abs(rows[doc_id]["avg_nll"] - want[doc_id]) < 1e-6


def test_kn_prefers_productive_continuations(spark):
    """The KN property add-k lacks: a word seen in MANY contexts gets more
    backoff mass than one glued to a single collocation. 'francisco' appears
    only after 'san' (high raw count, one context); 'day' follows many
    different words. After an unseen context, KN must prefer 'day'."""
    from parqueryd_spark.operators.lm import kn_score, lm_train

    train = [(i, "san francisco") for i in range(8)] + [
        (100, "good day"),
        (101, "bad day"),
        (102, "long day"),
        (103, "nice day"),
    ]
    lm = lm_train(_docs(spark, train))
    probe = [(1, "zzz day"), (2, "zzz francisco")]
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_score(_docs(spark, probe), "doc_id", lm).collect()
    }
    # lower NLL = more probable: 'day' (4 contexts) beats 'francisco' (1)
    assert got[1] < got[2], got
    assert math.isfinite(got[1]) and math.isfinite(got[2])


def test_stream_score_kn_smoothing_matches_batch(spark, tmp_path):
    """stream_score_documents(smoothing="kn"): the streamed KN scores equal
    the batch kn_score answer row-for-row over the same frozen counts, and
    invalid configurations refuse eagerly."""
    import pytest

    from parqueryd_spark.operators.lm import kn_score

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    pd.DataFrame(DOCS[:1], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b1.parquet")
    )
    pd.DataFrame(DOCS[1:], columns=["doc_id", "text"]).to_parquet(
        os.path.join(stream_in, "b2.parquet")
    )
    schema = "doc_id bigint, text string"
    lm = lm_train(_docs(spark, DOCS))

    scores_dir = str(tmp_path / "scores")
    stream = spark.readStream.schema(schema).parquet(stream_in)
    stream_score_documents(
        stream, lm, scores_dir, str(tmp_path / "ckpt"), smoothing="kn"
    ).awaitTermination()
    streamed = sorted(map(tuple, spark.read.parquet(scores_dir).drop("batch").collect()))
    batch = sorted(map(tuple, kn_score(_docs(spark, DOCS), "doc_id", lm).collect()))
    assert streamed == batch

    with pytest.raises(ValueError, match="add_k"):
        stream_score_documents(stream, lm, scores_dir, "x", smoothing="laplace")

    # r14: KN is order-n now — a trigram KN stream must equal batch kn_score
    lm3 = lm_train(_docs(spark, DOCS), n=3)
    scores3_dir = str(tmp_path / "scores3")
    stream_score_documents(
        stream, lm3, scores3_dir, str(tmp_path / "ckpt3"), smoothing="kn"
    ).awaitTermination()
    streamed3 = sorted(
        map(tuple, spark.read.parquet(scores3_dir).drop("batch").collect())
    )
    batch3 = sorted(map(tuple, kn_score(_docs(spark, DOCS), "doc_id", lm3).collect()))
    assert streamed3 == batch3
