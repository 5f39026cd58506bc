"""Property-based differential test of order-n interpolated Kneser–Ney
(operators/lm.py:kn_score, order-general since r14): on random small corpora
and random held-out probes — built from a tiny alphabet so collisions,
unseen grams, unseen contexts, and fully-unseen words all occur naturally —
the Spark scorer must agree with the independent pure-Python order-n
reference (tests/test_lm.py:_py_kn_n) at every order, and the per-order
continuation derivation must make orders mutually consistent (an order-n
model scores exactly like itself regardless of how many documents carry
its counts)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_lm import _py_kn_n

ALPHABET = ["a", "b", "c", "d"]

_doc = st.lists(
    st.sampled_from(ALPHABET), min_size=1, max_size=10
).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    train=st.lists(_doc, min_size=2, max_size=8),
    held=st.lists(_doc, min_size=1, max_size=5),
    n=st.sampled_from([2, 3]),
)
def test_kn_order_n_matches_pure_python(spark, train, held, n):
    from parqueryd_spark.operators.lm import kn_score, lm_train

    train_rows = list(enumerate(train))
    held_rows = [(100 + i, t) for i, t in enumerate(held)]
    want = _py_kn_n(train_rows, held_rows, n=n)
    lm = lm_train(
        spark.createDataFrame(train_rows, "doc_id long, text string"), n=n
    )
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_score(
            spark.createDataFrame(held_rows, "doc_id long, text string"),
            "doc_id",
            lm,
        ).collect()
    }
    # docs with fewer than n tokens are absent on BOTH sides
    assert set(got) == set(want)
    for doc_id, nll in want.items():
        assert math.isfinite(got[doc_id]), doc_id
        assert abs(got[doc_id] - nll) < 1e-6, (n, doc_id, got[doc_id], nll)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(train=st.lists(_doc, min_size=2, max_size=8))
def test_kn_probabilities_are_proper_discounts(spark, train):
    """Scoring the training corpus itself: every probability the fold emits
    lies in (0, 1], so avg_nll >= 0 and finite — the discount never leaks
    more mass than it reserved (a sign error or denominator swap in ANY
    level's derivation would produce p > 1 or p <= 0 somewhere on random
    inputs long before a curated fixture catches it)."""
    from parqueryd_spark.operators.lm import kn_score, lm_train

    rows = list(enumerate(train))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = lm_train(df, n=3)
    for r in kn_score(df, "doc_id", lm).collect():
        assert math.isfinite(r["avg_nll"]), r
        assert r["avg_nll"] >= 0.0, r  # p <= 1 everywhere
        assert r["n_bigrams"] >= 1, r
