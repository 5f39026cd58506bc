"""Pins for the r16 optimization round.

Covers the ADVICE r15 correctness items (NaN routing through the fused
exponent-bucket pass 0, the _group_pass0 driver budget vs the exponent-bucket
id space) and the r16 rewrites' equivalence contracts.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _sorted_oracle(vals: list[float], p: float) -> float:
    """quantile_disc over a Python sort with NaN LAST (Spark's sort order)."""
    from parqueryd_spark.operators.selection import quantile_rank

    s = sorted(vals, key=lambda v: (math.isnan(v), v))
    return s[quantile_rank(p, len(s)) - 1]


# ------------------------------------------------- ADVICE r15: NaN in pass 0


NAN_VALS = [1.0, 2.0, 3.0, float("nan"), float("nan"), float("nan"), float("nan")]


def _assert_q(got, want):
    if math.isnan(want):
        assert got is not None and math.isnan(got)
    else:
        assert got == want


@pytest.mark.parametrize("p", [0.1, 0.5, 0.6, 0.9, 1.0])
def test_exact_quantiles_nan_values(spark, p):
    """NaN values must land in the NULL exponent bucket and resolve to NaN
    when the rank falls there (ADVICE r15: the unguarded cast threw ANSI
    CAST_OVERFLOW), matching a plain sort with NaN last."""
    from parqueryd_spark.operators.selection import exact_quantiles

    df = spark.createDataFrame([(v,) for v in NAN_VALS], "v double")
    rows = exact_quantiles(spark, df, "v", [p], exact_threshold=2).collect()
    _assert_q(rows[0]["value"], _sorted_oracle(NAN_VALS, p))


def test_exact_quantiles_all_nan(spark):
    from parqueryd_spark.operators.selection import exact_quantiles

    df = spark.createDataFrame([(float("nan"),)] * 5, "v double")
    rows = exact_quantiles(spark, df, "v", [0.5], exact_threshold=2).collect()
    assert math.isnan(rows[0]["value"])


def test_exact_group_quantiles_nan_group(spark):
    """A NaN-heavy group resolves via the NULL-bucket degenerate path while
    clean groups are untouched (the grouped twin of the ANSI cast fix)."""
    from parqueryd_spark.operators.selection import exact_group_quantiles

    data = [("a", v) for v in NAN_VALS] + [("b", float(i)) for i in range(1, 8)]
    df = spark.createDataFrame(data, "k string, v double")
    got = {
        r["k"]: r["value"]
        for r in exact_group_quantiles(
            spark, df, ["k"], "v", 0.9, exact_threshold=2
        ).collect()
    }
    _assert_q(got["a"], _sorted_oracle(NAN_VALS, 0.9))
    assert got["b"] == 7.0


def test_exact_quantiles_cont_nan(spark):
    """The cont path's bracketing ranks both land in the NaN bucket at high
    p — the interpolated answer is NaN, matching sort-with-NaN-last."""
    from parqueryd_spark.operators.selection import exact_quantiles_cont

    df = spark.createDataFrame([(v,) for v in NAN_VALS], "v double")
    rows = exact_quantiles_cont(spark, df, "v", [0.95], exact_threshold=2).collect()
    assert math.isnan(rows[0]["value"])


def test_group_pass0_budget_uses_exponent_space(spark):
    """ADVICE r15 (low): wide-dynamic-range data with small bins must NOT
    trip the driver budget — pass 0 bins on the ~4402-id exponent space, so
    the budget is max_groups x max(bins, that space), not max_groups x bins."""
    from parqueryd_spark.operators.selection import exact_group_quantiles

    # one group, 200 distinct exponent buckets, bins=4: the old budget
    # (max_groups * bins = 1 * 4) rejected this in-contract input
    vals = [(float(2.0**e),) for e in range(200)]
    df = spark.createDataFrame(vals, "v double").select(
        F.lit("g").alias("k"), "v"
    )
    rows = exact_group_quantiles(
        spark, df, ["k"], "v", 0.5, bins=4, exact_threshold=2, max_groups=1
    ).collect()
    assert rows[0]["value"] == _sorted_oracle([v for (v,) in vals], 0.5)


# ------------------------------------------- r16: pruned KN stat derivation


def test_kn_stats_see_full_context_groups(spark):
    """Guards kn_score's stat derivation against slice-local
    under-aggregation: every context denominator (cc) and fan-out (nfwd)
    must aggregate the FULL key group sharing that context, not just the
    keys the scored slice references. (Pinned while evaluating — and
    ultimately REVERTING — an r16 restructure that derived the per-order
    tables pruned to the scored grams' suffix/context sets: exact, but
    measured 0.6x at sf0.1 and 0.7-0.9x at sf1 against the chained
    derivation, see OPTIMIZATION_r16.md. The fixture stays as a permanent
    equivalence pin: context 'a' continues into many words while the scored
    slice references exactly one of them.) Covered at n=2 and n=3 against
    the pure-Python reference, which always aggregates the full table."""
    from tests.test_lm import _docs, _py_kn, _py_kn_n
    from parqueryd_spark.operators.lm import kn_score, lm_train

    train = [
        (1, "a b a c a d a e a f"),   # 'a' fans out to 5 continuations
        (2, "x a y a z a b q"),       # 'a b' seen in a second context chain
        (3, "b c d e f g h i"),
    ]
    held = [
        (10, "a b"),          # one gram: cc('a') must count ALL 'a *' grams
        (11, "q a b c"),      # mixes seen/unseen contexts
        (12, "zz a b"),       # unseen word entering a heavy context
    ]
    lm2 = lm_train(_docs(spark, train), n=2)
    got2 = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_score(_docs(spark, held), "doc_id", lm2).collect()
    }
    want2 = _py_kn(train, held)
    assert set(got2) == set(want2)
    for doc_id, nll in want2.items():
        assert abs(got2[doc_id] - nll) < 1e-6, (doc_id, got2[doc_id], nll)

    lm3 = lm_train(_docs(spark, train), n=3)
    got3 = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_score(_docs(spark, held), "doc_id", lm3).collect()
    }
    want3 = _py_kn_n(train, held, n=3)
    assert set(got3) == set(want3)
    for doc_id, nll in want3.items():
        assert abs(got3[doc_id] - nll) < 1e-6, (doc_id, got3[doc_id], nll)
