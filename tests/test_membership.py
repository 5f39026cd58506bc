"""Bloom-filter membership (operators/membership.py): no false negatives by
construction, measured FP rate tracks theory, and the composed anti/semi
joins are EXACT (equal to their plain-join twins), including on empty build
sides. The probe must stay JVM-side (no Python evals in any plan)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parqueryd_spark.operators.membership import (
    bloom_anti_join,
    bloom_build,
    bloom_params,
    bloom_semi_join,
    with_bloom_flag,
)
from parqueryd_spark.plans.audit import plan_report


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(F.concat(F.lit("key-"), F.col("id")).alias(name))


def test_bloom_params_shapes():
    m, k = bloom_params(1000, 0.01)
    assert m >= 9000 and 5 <= k <= 10  # ~9.6 bits/key, 7 hashes at 1%
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives(spark):
    bench = _keys(spark, 0, 2000)
    m, k = bloom_params(2000, 0.01)
    bloom = bloom_build(bench, "k", num_bits=m, num_hashes=k)
    flagged = with_bloom_flag(bench, "k", bloom)
    assert flagged.filter(~F.col("maybe_member")).count() == 0


def test_fp_rate_tracks_theory(spark):
    n, probes = 2000, 20000
    bench = _keys(spark, 0, n)
    m, k = bloom_params(n, 0.01)
    bloom = bloom_build(bench, "k", num_bits=m, num_hashes=k)
    nonmembers = _keys(spark, 10_000_000, 10_000_000 + probes)
    fp = (
        with_bloom_flag(nonmembers, "k", bloom)
        .filter(F.col("maybe_member"))
        .count()
    )
    theoretical = (1 - math.exp(-k * n / m)) ** k
    assert fp / probes < 5 * theoretical  # generous: binomial noise at 20k probes


def test_anti_join_equals_exact(spark):
    corpus = spark.range(500, 5000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    bench = _keys(spark, 0, 1000)
    got = bloom_anti_join(corpus, bench, "k")
    want = corpus.join(bench, "k", "left_anti")
    assert got.columns == corpus.columns
    assert sorted(r.v for r in got.collect()) == sorted(r.v for r in want.collect())


def test_semi_join_equals_exact(spark):
    corpus = spark.range(500, 5000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    bench = _keys(spark, 0, 1000)
    got = bloom_semi_join(corpus, bench, "k")
    want = corpus.join(bench.distinct(), "k", "left_semi")
    assert sorted(r.v for r in got.collect()) == sorted(r.v for r in want.collect())
    assert got.count() == 500


def test_empty_build_side(spark):
    corpus = _keys(spark, 0, 100)
    empty = _keys(spark, 0, 0)
    assert bloom_anti_join(corpus, empty, "k", expected_items=1).count() == 100
    assert bloom_semi_join(corpus, empty, "k", expected_items=1).count() == 0


def test_probe_side_reserved_columns_guarded(spark):
    bench = _keys(spark, 0, 10)
    bloom = bloom_build(bench, "k", num_bits=64, num_hashes=1)
    bad = bench.withColumn("bitmap", F.lit(1))
    with pytest.raises(ValueError, match="bitmap"):
        with_bloom_flag(bad, "k", bloom)


def test_probe_is_jvm_only(spark):
    """The bloom build + probe + verify pipeline must introduce no Python
    evals — the whole point is a codegen-resident runtime filter."""
    corpus = _keys(spark, 0, 1000)
    bench = _keys(spark, 0, 100)
    rep = plan_report(bloom_anti_join(corpus, bench, "k"))
    assert rep["python_evals"] == 0


def test_bloom_merge_equals_union_build(spark):
    """bloom(A) ⊔ bloom(B) must be bit-for-bit bloom(A ∪ B) — the
    incremental-maintenance contract: per-increment blooms merge at read
    time instead of re-scanning the standing corpus."""
    a = _keys(spark, 0, 500)
    b = _keys(spark, 400, 900)
    m, k = bloom_params(1000, 0.01)
    from parqueryd_spark.operators.membership import bloom_merge

    merged = bloom_merge(
        [
            bloom_build(a, "k", num_bits=m, num_hashes=k),
            bloom_build(b, "k", num_bits=m, num_hashes=k),
        ]
    ).collect()[0]
    direct = bloom_build(
        a.unionByName(b), "k", num_bits=m, num_hashes=k
    ).collect()[0]
    assert merged.n_bits == direct.n_bits and merged.n_hashes == direct.n_hashes
    assert dict(merged.bitmap) == dict(direct.bitmap)


def test_bloom_merge_rejects_mismatched_params(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from parqueryd_spark.operators.membership import bloom_merge

    a = bloom_build(_keys(spark, 0, 10), "k", num_bits=64, num_hashes=1)
    b = bloom_build(_keys(spark, 0, 10), "k", num_bits=128, num_hashes=1)
    with pytest.raises((SparkRuntimeException, Exception), match="mismatched"):
        bloom_merge([a, b]).collect()
    with pytest.raises(ValueError):
        bloom_merge([])


def test_bloom_roundtrips_via_parquet(spark, tmp_path):
    """The filter is plain data: write/read parquet and probe identically."""
    bench = _keys(spark, 0, 300)
    m, k = bloom_params(300, 0.01)
    path = str(tmp_path / "bloom")
    bloom_build(bench, "k", num_bits=m, num_hashes=k).write.parquet(path)
    reloaded = spark.read.parquet(path)
    flagged = with_bloom_flag(bench, "k", reloaded)
    assert flagged.filter(~F.col("maybe_member")).count() == 0
