"""Property-based differential tests of the auditable sketch layer:

- heavy_hitters_exact_topk: on random weighted streams, whenever the plan's
  completeness proof passes, the result must equal the brute-force exact
  top-k (counts, order, tiebreaks); when the proof CANNOT pass the plan must
  raise — never return a silently-unprovable cut.
- kmv_sketch(hash_fn="md5_52"): the sketch must equal the k smallest
  52-bit md5-prefix hashes of the distinct values computed in pure Python —
  exact float equality, any partitioning — and kmv_distinct must apply the
  (k-1)/theta estimate exactly.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

# small key space + skewed multiplicities: forces both eviction-heavy and
# eviction-free partitions
_stream = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 20)), min_size=1, max_size=25
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_stream, capacity=st.sampled_from([2, 8, 64]))
def test_exact_topk_is_exact_or_raises(spark, pairs, capacity):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from parqueryd_spark.operators.sketches import heavy_hitters_exact_topk

    rows = [(f"k{k}",) for k, mult in pairs for _ in range(mult)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    counts: dict[str, int] = {}
    for k, mult in pairs:
        counts[f"k{k}"] = counts.get(f"k{k}", 0) + mult
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    try:
        got = [
            (r.k, r.n_occurrences)
            for r in heavy_hitters_exact_topk(df, "k", k=5, capacity=capacity).collect()
        ]
    except (ValueError, SparkRuntimeException, Py4JJavaError) as e:
        assert "not provably exact" in str(e)
        return
    assert got == want, (got, want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(st.text(alphabet="abcxyz09", min_size=0, max_size=6), min_size=1, max_size=40),
    k=st.sampled_from([2, 5, 16]),
    parts=st.sampled_from([1, 7]),
)
def test_kmv_md5_matches_pure_python(spark, values, k, parts):
    from parqueryd_spark.operators.sketches import kmv_distinct, kmv_sketch

    df = (
        spark.createDataFrame([(v,) for v in values], "v string")
        .withColumn("g", F.lit(1))
        .repartition(parts)
    )
    sk = kmv_sketch(df, ["g"], "v", k=k, hash_fn="md5_52")
    row = sk.collect()
    assert len(row) == 1
    got = row[0].kmv

    us = sorted(
        int(hashlib.md5(v.encode()).hexdigest()[:13], 16) / 2.0**52
        for v in set(values)
    )[:k]
    assert got == us

    est = kmv_distinct(sk, k=k).collect()[0].n_distinct
    nd = len(set(values))
    if nd < k:
        assert est == nd  # undersized sketch is exact
    else:
        assert est == round((k - 1) / us[k - 1])
