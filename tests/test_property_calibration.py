"""Property-based differential test of the frozen calibration gate: on random
reference windows and random probe scores, calibration_cdf + calibration_score
must agree with a trivially-correct pure-Python empirical-CDF step lookup, and
the served values must be invariant to how the probe batch is composed."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parqueryd_spark.operators.quality import calibration_cdf, calibration_score


def _py_step_lookup(ref_scores: list[int], probes: list[int]) -> dict[int, float]:
    """cdf(s) = fraction of reference rows at or below the LARGEST reference
    score <= s; 0.0 below all reference scores."""
    n = len(ref_scores)
    srt = sorted(ref_scores)
    out = {}
    for i, p in enumerate(probes):
        at_or_below = sum(1 for r in srt if r <= p)
        out[i] = round(at_or_below / n, 6) if at_or_below else 0.0
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ref=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    probes=st.lists(st.integers(min_value=-5, max_value=40), min_size=1, max_size=15),
)
def test_frozen_gate_matches_pure_python_cdf(spark, ref, probes):
    ref_df = spark.createDataFrame(
        [(i, "g", s) for i, s in enumerate(ref)], "id long, g string, s long"
    )
    cdf = calibration_cdf(ref_df, "g", "s")
    probe_df = spark.createDataFrame(
        [(i, "g", s) for i, s in enumerate(probes)], "doc long, g string, s long"
    )
    got = {r.doc: r.calib for r in calibration_score(cdf, probe_df, "g", "s", "doc").collect()}
    want = _py_step_lookup(ref, probes)
    assert got == want, (ref, probes, got, want)
