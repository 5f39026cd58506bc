"""Property-based differential test of BM25: on random small-vocab corpora
and random query-term subsets, the Spark zero-shuffle scoring plan must agree
with a trivially-correct pure-Python Okapi implementation to float precision."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parqueryd_spark.operators.text import bm25_scores

VOCAB = ["a", "b", "c", "d"]
K1, B = 1.2, 0.75


def _py_bm25(docs: list[tuple[int, str]], terms: list[str]) -> dict[int, tuple[int, float]]:
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = {}
    for d, t in docs:
        tl = toks[d]
        score, match = 0.0, 0
        for q in terms:
            tf = tl.count(q)
            if tf == 0:
                continue
            match += 1
            idf = math.log(1.0 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            score += idf * (tf * (K1 + 1.0)) / (tf + K1 * (1 - B + B * len(tl) / avgdl))
        if match:
            out[d] = (match, score)
    return out


_doc = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc, min_size=1, max_size=8),
    terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True),
)
def test_bm25_matches_pure_python(spark, texts, terms):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_match"], r["score"])
        for r in bm25_scores(df, "doc_id", "text", terms, K1, B).collect()
    }
    want = _py_bm25(docs, terms)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-9, (d, got[d], want[d])


def test_bm25_scan_path_rejects_degenerate_term_count(spark):
    """The scan path widens the plan per query term; past the documented
    ceiling it must push users to the index path instead of compiling a
    pathological expression tree."""
    import pytest

    from parqueryd_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="index path"):
        bm25_scores(df, "doc_id", "text", [f"t{i}" for i in range(65)])
