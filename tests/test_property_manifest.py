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
