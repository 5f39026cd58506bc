"""Property-based soundness for zone-map pruning: for ARBITRARY small
datasets (nulls, duplicated values, negatives, empty strings, single-row
files) and ARBITRARY where-term lists, scan_pruned must equal the full
filtered scan and count_pruned must equal the exact count. Hypothesis
drives the generator; Spark executions are slow, so examples are few but
adversarial (shrinking converges on minimal counterexamples)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parqueryd_spark.functions.compile import compile_where_terms
from parqueryd_spark.sources.manifest import build_manifest, count_pruned, scan_pruned

_NUMS = st.one_of(
    st.none(),
    st.integers(min_value=-50, max_value=50).map(float),
)
_STRS = st.one_of(st.none(), st.sampled_from(["", "a", "ab", "b", "zz"]))
_ROWS = st.lists(st.tuples(_NUMS, _STRS), min_size=1, max_size=30)

_OPS_NUM = ["==", "!=", ">", ">=", "<", "<=", "in", "not in"]


@st.composite
def _terms(draw):
    out = []
    for _ in range(draw(st.integers(0, 2))):
        col = draw(st.sampled_from(["v", "s"]))
        op = draw(st.sampled_from(_OPS_NUM))
        if col == "v":
            val = draw(st.integers(-55, 55)).__float__()
        else:
            val = draw(st.sampled_from(["", "a", "ab", "c", "zz"]))
        if op in ("in", "not in"):
            val = [val] + ([draw(st.sampled_from(["a", "b"])) if col == "s" else float(draw(st.integers(-55, 55)))])
        out.append([col, op, val])
    return out


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    return {"root": tmp_path_factory.mktemp("prop_manifest"), "i": 0}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_ROWS, terms=_terms(), n_files=st.integers(1, 4))
def test_pruned_scan_and_count_equal_exact(spark, seq, rows, terms, n_files):
    seq["i"] += 1
    path = str(seq["root"] / f"d{seq['i']}")
    df = spark.createDataFrame(
        [(i, v, s) for i, (v, s) in enumerate(rows)], "k long, v double, s string"
    )
    df.repartition(min(n_files, len(rows))).write.mode("overwrite").parquet(path)
    mf = build_manifest(spark, path)

    pred = compile_where_terms(terms)
    full = spark.read.parquet(path)
    if pred is not None:
        full = full.filter(pred)
    want = sorted(r.k for r in full.collect())
    got = sorted(
        r.k for r in scan_pruned(spark, path, terms, manifest=mf).collect()
    )
    assert got == want, (terms, rows)
    assert count_pruned(spark, path, terms, manifest=mf) == len(want), (terms, rows)


_INTERVALS = st.lists(
    st.tuples(st.integers(-30, 30), st.integers(0, 25)), min_size=1, max_size=20
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    ia=_INTERVALS,
    ib=_INTERVALS,
    width=st.sampled_from([1.0, 3.0, 7.0, 50.0]),
)
def test_interval_join_equals_theta_property(spark, ia, ib, width):
    """interval_join over arbitrary (possibly touching, nested, duplicate,
    zero-length) intervals equals the naive theta join at any bucket width —
    zero-length intervals [x, x) match nothing (half-open)."""
    from parqueryd_spark.operators.relational import interval_join

    a = spark.createDataFrame(
        [(i, float(s), float(s + l)) for i, (s, l) in enumerate(ia)],
        "aid long, astart double, aend double",
    )
    b = spark.createDataFrame(
        [(i, float(s), float(s + l)) for i, (s, l) in enumerate(ib)],
        "bid long, bstart double, bend double",
    )
    got = sorted(
        (r.aid, r.bid)
        for r in interval_join(a, b, ("astart", "aend"), ("bstart", "bend"), width).collect()
    )
    # pure-Python oracle: exact, and far cheaper than a second Spark job.
    # The l > 0 / m > 0 guards matter: the naive s < f && t < e overlap
    # formula is only valid for NON-empty intervals — a zero-length [x, x)
    # contains no points and overlaps nothing (hypothesis found exactly this
    # counterexample against the unguarded oracle; the operator drops empty
    # intervals by construction).
    want = sorted(
        (i, j)
        for i, (s, l) in enumerate(ia)
        for j, (t, m) in enumerate(ib)
        if l > 0 and m > 0 and s < t + m and t < s + l
    )
    assert got == want, (ia, ib, width)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    xs=st.lists(st.integers(-40, 40), min_size=1, max_size=20),
    ys=st.lists(st.integers(-40, 40), min_size=1, max_size=20),
    delta=st.sampled_from([0.0, 1.0, 5.0, 13.0]),
    wmul=st.sampled_from([1.0, 2.5, 10.0]),
)
def test_band_join_equals_theta_property(spark, xs, ys, delta, wmul):
    from parqueryd_spark.operators.relational import band_join

    a = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "aid long, x double"
    )
    b = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(ys)], "bid long, y double"
    )
    width = max(delta, 1e-9) * wmul
    got = sorted(
        (r.aid, r.bid)
        for r in band_join(a, b, "x", "y", delta, bucket_width=width).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(xs)
        for j, y in enumerate(ys)
        if abs(x - y) <= delta
    )
    assert got == want, (xs, ys, delta, wmul)
