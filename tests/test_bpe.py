"""BPE trainer (operators/bpe.py) vs a pure-Python reference implementation
of classic BPE (Sennrich et al. 2016) with the identical determinism contract
(max pair count, then lexicographically smallest pair; greedy left-to-right
non-overlapping rewrite): the learned merge SEQUENCE and the final
tokenization must match exactly."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from parqueryd_spark.operators.bpe import bpe_encode, bpe_train, merge_pair, word_table


# --- pure-Python reference ---------------------------------------------


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts: list[str], num_merges: int, min_pair_count: int = 2):
    words = Counter(w for t in texts for w in t.split(" ") if w)
    state = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        state = {w: _py_merge(s, a, b) for w, s in state.items()}
    return merges, state


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _docs(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")


def test_merge_pair_rewrite_matches_reference(spark):
    cases = [
        (["a", "a", "a"], "a", "a"),          # overlap: merge once, greedy left
        (["a", "b", "a", "b"], "a", "b"),     # two disjoint merges
        (["x"], "a", "b"),                    # single symbol untouched
        (["a", "b", "b"], "b", "b"),          # merge at the tail
        (["a", "b"], "a", "b"),               # whole word becomes one symbol
    ]
    for syms, a, b in cases:
        one = spark.createDataFrame([(syms,)], "syms array<string>")
        got = one.select(merge_pair(F.col("syms"), a, b).alias("m")).collect()[0]["m"]
        assert got == _py_merge(syms, a, b), (syms, a, b)


def test_trained_merge_sequence_matches_python_reference(spark):
    py_merges, py_state = _py_train(TEXTS, 12)
    merges = bpe_train(_docs(spark), num_merges=12, checkpoint_every=3)
    assert merges == py_merges
    assert len(merges) >= 6  # the corpus genuinely supports several merges

    # final segmentation of every corpus word matches the reference state
    wt = word_table(_docs(spark))
    from parqueryd_spark.operators.bpe import bpe_segment

    seg = {
        r["word"]: list(r["bpe_tokens"])
        for r in bpe_segment(wt.select("word"), merges).collect()
    }
    assert seg == {w: s for w, s in py_state.items()}


def test_encode_reassembles_documents_in_word_order(spark):
    merges, py_state = _py_train(TEXTS, 12)
    out = {
        r["doc_id"]: (r["n_tokens"], list(r["bpe_tokens"]))
        for r in bpe_encode(_docs(spark), "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(TEXTS):
        expect = [tok for w in t.split(" ") if w for tok in py_state[w]]
        assert out[i] == (len(expect), expect), i


def test_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once: below the default floor of 2 -> zero merges
    assert bpe_train(docs, num_merges=5) == []
