"""Property tests for exact selection (operators/selection.py): against an
adversarial generator (heavy duplicates, negative/huge magnitudes, NULLs,
single-double mass concentrations) the histogram-narrowing answer must equal
the plain sorted-index oracle for EVERY generated (values, prob) pair — both
the global and the grouped form — under forced multi-pass narrowing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parqueryd_spark.operators.selection import (
    exact_group_quantiles,
    exact_quantiles,
    quantile_rank,
)

# values that stress binning: duplicates, tight clusters, huge spread
_VALUE = st.one_of(
    st.sampled_from([0.0, 1.0, 1.0, -3.5, 1e9, -1e9, 0.1]),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
)
_VALUES = st.lists(st.one_of(_VALUE, st.none()), min_size=1, max_size=120)
_PROB = st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 0.99, 1.0])


def _oracle(vals, p):
    present = sorted(v for v in vals if v is not None)
    if not present:
        return None
    return present[quantile_rank(p, len(present)) - 1]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(vals=_VALUES, p=_PROB)
def test_exact_quantiles_equal_sorted_oracle(spark, vals, p):
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = exact_quantiles(spark, df, "value", [p], bins=4, exact_threshold=3).collect()
    assert got[0]["value"] == _oracle(vals, p)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3"]), _VALUES, min_size=1, max_size=3
    ),
    p=_PROB,
)
def test_group_quantiles_equal_sorted_oracle_per_group(spark, groups, p):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {
        r["grp"]: r["value"]
        for r in exact_group_quantiles(
            spark, df, ["grp"], "value", p, bins=4, exact_threshold=3
        ).collect()
    }
    expected = {g: _oracle(vals, p) for g, vals in groups.items() if _oracle(vals, p) is not None}
    assert got == expected
