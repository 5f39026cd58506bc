"""Regression tests for review findings: prefix-filter float shortfall at the
exact threshold, LSH banding validation, string-id dedup, asof column guards,
compiler op normalization, early query validation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parqueryd_spark.core import aggregate_files
from parqueryd_spark.functions.compile import QueryCompileError, compile_where_terms
from parqueryd_spark.operators.dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs
from parqueryd_spark.operators.relational import asof_join


def test_jaccard_exact_at_threshold_boundary(spark):
    """A pair at exactly Jaccard 0.8 with |S| divisible by 5 — the double
    arithmetic shortfall case: floor(0.19999...*10) lost one prefix element
    and could drop the pair from candidates."""
    words = [f"w{i}" for i in range(12)]
    # doc a: 10 distinct 1-token shingles via k=1... use k=3 shingles directly:
    # construct texts whose 3-gram shingle sets have |A|=10, |B|=8, |A∩B|=8
    a_text = " ".join(words[:12])  # 10 distinct 3-gram shingles
    b_text = " ".join(words[2:12])  # 8 shingles, all contained in a's set
    df = spark.createDataFrame([(1, a_text), (2, b_text)], "doc_id long, text string")
    out = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.8).collect()
    assert len(out) == 1 and abs(out[0].jaccard - 0.8) < 1e-12


def test_minhash_param_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=32)
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=100, bands=32)


def test_exact_dedup_string_ids(spark):
    df = spark.createDataFrame(
        [("doc-b", "same"), ("doc-a", "same"), ("doc-c", "other")],
        "doc_id string, text string",
    )
    out = exact_dedup(df, "text", "doc_id").toPandas().sort_values("n_copies")
    assert list(out["keep_id"]) == ["doc-c", "doc-a"]  # lowest string id kept, not NULL


def test_asof_right_ts_in_right_cols_no_duplicate_columns(spark):
    left = spark.createDataFrame([(1, 100.0)], "k long, ts double").select(
        "k", F.timestamp_seconds("ts").alias("ts")
    )
    right = spark.createDataFrame([(1, 90.0, "a")], "k long, ts double, v string").select(
        "k", F.timestamp_seconds("ts").alias("ts"), "v"
    )
    out = asof_join(left, right, ["k"], "ts", "ts", right_cols=["ts", "v"])
    assert out.columns.count("ts_right") == 1
    with pytest.raises(ValueError, match="__"):
        asof_join(left.withColumn("__tag", F.lit(1)), right, ["k"], "ts", "ts")


def test_compiler_op_normalization(spark):
    assert compile_where_terms([["a", " IN ", [1]]]) is not None
    assert compile_where_terms([["a", " == ", 1]]) is not None  # padded compare op
    with pytest.raises(QueryCompileError):
        compile_where_terms([["a", ["=="], 1]])  # unhashable op -> typed error


def test_invalid_agg_raises_even_with_missing_shards(spark):
    with pytest.raises(QueryCompileError):
        aggregate_files(spark, ["/no/such.parquet"], ["k"], [], aggregate=True)
    with pytest.raises(QueryCompileError):
        aggregate_files(spark, ["/no/such.parquet"], ["k"], [["v", "median", "m"]])
