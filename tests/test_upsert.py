"""Upsert/MERGE into plain-parquet datasets (sources/sinks.py
upsert_parquet / upsert_partitioned): replace-by-key, insert-new, delete-
flagged, partition pruning on the partitioned variant."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parqueryd_spark.sources.sinks import upsert_parquet, upsert_partitioned


def _rows(spark, path):
    return {
        (r.k, r.day): r.v for r in spark.read.parquet(path).collect()
    }


@pytest.fixture
def base_path(spark, tmp_path):
    p = os.path.join(str(tmp_path), "tbl")
    spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d2", "d")],
        "k long, day string, v string",
    ).write.parquet(p)
    return p


def test_upsert_replaces_inserts_deletes(spark, base_path):
    updates = spark.createDataFrame(
        [(2, "d1", "B", False), (5, "d3", "e", False), (3, "d2", None, True)],
        "k long, day string, v string, is_delete boolean",
    )
    upsert_parquet(spark, base_path, updates, ["k"], delete_col="is_delete")
    assert _rows(spark, base_path) == {
        (1, "d1"): "a",
        (2, "d1"): "B",  # replaced
        (4, "d2"): "d",
        (5, "d3"): "e",  # inserted
        # (3, d2) deleted
    }


def test_upsert_without_delete_col(spark, base_path):
    updates = spark.createDataFrame([(1, "d1", "A")], "k long, day string, v string")
    upsert_parquet(spark, base_path, updates, ["k"])
    got = _rows(spark, base_path)
    assert got[(1, "d1")] == "A" and len(got) == 4


def test_upsert_rejects_hive_partitioned_target(spark, tmp_path):
    p = os.path.join(str(tmp_path), "part_tbl")
    spark.createDataFrame(
        [(1, "d1", "a")], "k long, day string, v string"
    ).write.partitionBy("day").parquet(p)
    updates = spark.createDataFrame([(1, "d1", "A")], "k long, day string, v string")
    with pytest.raises(ValueError, match="upsert_partitioned"):
        upsert_parquet(spark, p, updates, ["k"])


@pytest.fixture
def part_path(spark, tmp_path):
    p = os.path.join(str(tmp_path), "part_tbl")
    spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d3", "d")],
        "k long, day string, v string",
    ).write.partitionBy("day").parquet(p)
    return p


def test_upsert_partitioned_touches_only_changed_days(spark, part_path):
    # record d3's files before: an untouched partition must not be rewritten
    d3_dir = os.path.join(part_path, "day=d3")
    d3_before = sorted(os.listdir(d3_dir))
    updates = spark.createDataFrame(
        [(2, "d1", "B", False), (9, "d1", "x", False), (3, "d2", None, True)],
        "k long, day string, v string, is_delete boolean",
    )
    touched = upsert_partitioned(
        spark, part_path, updates, ["k"], "day", delete_col="is_delete"
    )
    assert sorted(touched) == ["d1", "d2"]
    assert _rows(spark, part_path) == {
        (1, "d1"): "a",
        (2, "d1"): "B",
        (9, "d1"): "x",
        (4, "d3"): "d",
    }
    assert sorted(os.listdir(d3_dir)) == d3_before, "untouched partition rewritten"


def test_upsert_partitioned_prunes_base_scan(spark, part_path):
    """The merge plan must read only the touched partitions of the base."""
    updates = spark.createDataFrame(
        [(2, "d1", "B")], "k long, day string, v string"
    )
    base = spark.read.parquet(part_path).filter(F.col("day").isin(["d1"]))
    plan = base._jdf.queryExecution().executedPlan().toString()
    assert "d2" not in plan and "d3" not in plan


def test_upsert_key_moving_partition(spark, part_path):
    """An update that moves a key to a new partition must not leave the stale
    row behind in its old partition... the pruned variant CANNOT see the old
    row (its partition isn't touched) — documented behavior: partition moves
    need the old partition listed too, via a delete row."""
    updates = spark.createDataFrame(
        [(4, "d4", "D", False), (4, "d3", None, True)],
        "k long, day string, v string, is_delete boolean",
    )
    upsert_partitioned(spark, part_path, updates, ["k"], "day", delete_col="is_delete")
    got = _rows(spark, part_path)
    assert got[(4, "d4")] == "D"
    assert (4, "d3") not in got


def test_upsert_partitioned_drops_emptied_hive_escaped_partition(spark, tmp_path):
    """Partition values with hive-escaped characters (space, colon) must
    still have their directory dropped when the merge empties them."""
    p = os.path.join(str(tmp_path), "esc_tbl")
    spark.createDataFrame(
        [(1, "d 1:x", "a"), (2, "plain", "b")], "k long, day string, v string"
    ).write.partitionBy("day").parquet(p)
    # Spark's escaper leaves spaces but %-encodes ':' — the dir a raw
    # f-string would never name
    assert "day=d 1%3Ax" in os.listdir(p), os.listdir(p)
    updates = spark.createDataFrame(
        [(1, "d 1:x", None, True)], "k long, day string, v string, is_delete boolean"
    )
    upsert_partitioned(spark, p, updates, ["k"], "day", delete_col="is_delete")
    assert _rows(spark, p) == {(2, "plain"): "b"}
    assert not any(d.startswith("day=d ") for d in os.listdir(p))
