"""Versioned publication (sources/sinks.py publish_versioned): retained
generations, current-pointer reads, time travel, metadata-only rollback,
and pruning that never deletes the pointed-at generation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parqueryd_spark.sources.sinks import (
    current_generation,
    publish_versioned,
    read_current,
    read_generation,
    rollback_generation,
)


def _df(spark, tag):
    return spark.createDataFrame([(1, tag), (2, tag)], "k long, tag string")


def test_publish_read_timetravel_rollback(spark, tmp_path):
    root = os.path.join(str(tmp_path), "ds")
    assert publish_versioned(_df(spark, "v0"), root) == 0
    assert publish_versioned(_df(spark, "v1"), root) == 1
    assert current_generation(spark, root) == 1
    assert {r.tag for r in read_current(spark, root).collect()} == {"v1"}
    # time travel to the retained previous generation
    assert {r.tag for r in read_generation(spark, root, 0).collect()} == {"v0"}
    # metadata-only undo
    rollback_generation(spark, root, 0)
    assert {r.tag for r in read_current(spark, root).collect()} == {"v0"}
    with pytest.raises(ValueError, match="not retained"):
        rollback_generation(spark, root, 99)


def test_pruning_keeps_n_and_never_current(spark, tmp_path):
    root = os.path.join(str(tmp_path), "ds")
    for i in range(5):
        publish_versioned(_df(spark, f"v{i}"), root, keep_generations=2)
    gens = sorted(
        int(d[4:]) for d in os.listdir(root) if d.startswith("gen=")
    )
    assert gens == [3, 4]
    assert current_generation(spark, root) == 4
    assert {r.tag for r in read_current(spark, root).collect()} == {"v4"}


def test_readers_always_see_complete_generation(spark, tmp_path):
    root = os.path.join(str(tmp_path), "ds")
    publish_versioned(_df(spark, "v0"), root)
    before = read_current(spark, root)
    publish_versioned(_df(spark, "v1").filter(F.col("k") == 1), root)
    # a reader holding the old generation still reads it intact (retained)
    assert before.count() == 2
    assert read_current(spark, root).count() == 1


def test_pointer_flip_never_leaves_pointerless_window(spark, tmp_path):
    """The flip is append-then-prune: at every step at least one _ptr marker
    exists, and extra markers (a crash between append and prune) resolve to
    the highest sequence."""
    root = os.path.join(str(tmp_path), "ds")
    publish_versioned(_df(spark, "v0"), root)
    publish_versioned(_df(spark, "v1"), root)
    ptrs = [d for d in os.listdir(root) if d.startswith("_ptr.")]
    assert len(ptrs) == 1
    # simulate a crash that left BOTH markers: reader picks the newest
    import pathlib

    stale = pathlib.Path(root) / "_ptr.0000000000.0"
    stale.touch()
    assert current_generation(spark, root) == 1


def test_vacuum_protects_current_and_keep_last(spark, tmp_path):
    from parqueryd_spark.sources.sinks import (
        list_generations,
        publish_versioned,
        read_current,
        rollback_generation,
        vacuum_generations,
    )

    root = str(tmp_path / "ds")
    for i in range(4):
        df = spark.createDataFrame([(i, f"v{i}")], "id long, val string")
        publish_versioned(df, root, keep_generations=10)
    assert [g for g, _ in list_generations(spark, root)] == [0, 1, 2, 3]

    # roll back to gen 1, then vacuum keep_last=1: gen 3 (newest) and gen 1
    # (pointer target) must survive; 0 and 2 go
    rollback_generation(spark, root, 1)
    deleted = vacuum_generations(spark, root, keep_last=1)
    assert deleted == [0, 2]
    assert list_generations(spark, root) == [(1, True), (3, False)]
    assert read_current(spark, root).collect()[0]["val"] == "v1"

    import pytest

    with pytest.raises(ValueError):
        vacuum_generations(spark, root, keep_last=0)


def test_generation_diff_reports_added_removed_changed(spark, tmp_path):
    from parqueryd_spark.sources.sinks import generation_diff, publish_versioned

    root = str(tmp_path / "ds2")
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id long, val string")
    publish_versioned(a, root)
    b = spark.createDataFrame([(2, "y"), (3, "zz"), (4, "w")], "id long, val string")
    publish_versioned(b, root)
    diff = {
        (r["status"], r["id"])
        for r in generation_diff(spark, root, 0, 1, keys=["id"]).collect()
    }
    assert diff == {("removed", 1), ("changed", 3), ("added", 4)}
