"""Unit tests for chunk_documents (operators/sampling.py): coverage,
overlap, short-doc passthrough, and stride arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parqueryd_spark.operators.sampling import chunk_documents


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, "doc_id", "text", **kw).orderBy("chunk_id").collect()
    return [r.chunk_text for r in rows]


def test_short_doc_is_one_chunk(spark):
    assert _chunks(spark, "a b c", max_tokens=8, overlap=2) == ["a b c"]


def test_chunks_overlap_and_cover(spark):
    toks = [f"t{i}" for i in range(10)]
    got = _chunks(spark, " ".join(toks), max_tokens=4, overlap=2)
    # stride 2, ceil((10-2)/2) = 4 chunks starting 0,2,4,6 — the count is the
    # minimum that still covers every token (no trailing overlap-only chunk)
    assert got == ["t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"]
    covered = set()
    for c in got:
        covered.update(c.split(" "))
    assert covered == set(toks)
    for a, b in zip(got, got[1:]):
        assert a.split(" ")[-2:] == b.split(" ")[:2]


def test_exact_budget_single_chunk(spark):
    toks = " ".join(str(i) for i in range(8))
    assert _chunks(spark, toks, max_tokens=8, overlap=2) == [toks]


def test_overlap_must_be_smaller_than_budget(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", max_tokens=4, overlap=4)


def test_stratified_exact_sample_counts_and_determinism(spark):
    from parqueryd_spark.operators.sampling import stratified_exact_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(100)], "id long, s string"
    )
    s1 = stratified_exact_sample(df, "id", 10, "s", salt="x")
    counts = {r.s: r.n for r in s1.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 10}
    # deterministic: same salt -> same rows; different salt -> different draw
    ids1 = sorted(r.id for r in s1.collect())
    ids2 = sorted(
        r.id for r in stratified_exact_sample(df, "id", 10, "s", salt="x").collect()
    )
    ids3 = sorted(
        r.id for r in stratified_exact_sample(df, "id", 10, "s", salt="y").collect()
    )
    assert ids1 == ids2 and ids1 != ids3


def test_stratified_exact_sample_small_stratum_keeps_all(spark):
    from parqueryd_spark.operators.sampling import stratified_exact_sample

    df = spark.createDataFrame([(1, "tiny"), (2, "tiny")], "id long, s string")
    assert stratified_exact_sample(df, "id", 10, "s").count() == 2
