"""Streaming CDC apply (streaming/cdc.py): micro-batches of changes merged
into a parquet dataset — replace/insert/delete, intra-batch collapse by
sequence, partition-pruned apply, and idempotent replay."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from parqueryd_spark.streaming.cdc import collapse_changes, stream_apply_cdc

COLS = ["k", "day", "v", "is_delete", "seq"]


def _write(path: str, rows: list[tuple]) -> None:
    pd.DataFrame(rows, columns=COLS).to_parquet(path)


def _table(spark, path):
    return {(r.k, r.day): r.v for r in spark.read.parquet(path).collect()}


@pytest.fixture
def base(spark, tmp_path):
    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")],
        "k long, day string, v string",
    ).write.partitionBy("day").parquet(p)
    return p


def test_stream_cdc_applies_batches_in_order(spark, tmp_path, base):
    stream_in = str(tmp_path / "changes")
    os.makedirs(stream_in)
    # batch 1: replace k=2, insert k=4 into a new partition
    _write(
        os.path.join(stream_in, "c1.parquet"),
        [(2, "d1", "B", False, 10), (4, "d3", "d", False, 11)],
    )
    time.sleep(1.1)
    # batch 2: delete k=3, then re-replace k=2 (later batch wins)
    _write(
        os.path.join(stream_in, "c2.parquet"),
        [(3, "d2", None, True, 20), (2, "d1", "B2", False, 21)],
    )
    schema = spark.read.parquet(os.path.join(stream_in, "c1.parquet")).schema
    changes = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    )
    q = stream_apply_cdc(
        changes,
        base,
        str(tmp_path / "ckpt"),
        key_cols=["k"],
        partition_col="day",
        delete_col="is_delete",
        seq_col="seq",
    )
    q.awaitTermination()
    assert _table(spark, base) == {
        (1, "d1"): "a",
        (2, "d1"): "B2",
        (4, "d3"): "d",
    }


def test_stream_cdc_restart_is_idempotent(spark, tmp_path, base):
    stream_in = str(tmp_path / "changes")
    os.makedirs(stream_in)
    _write(os.path.join(stream_in, "c1.parquet"), [(2, "d1", "B", False, 1)])
    schema = spark.read.parquet(os.path.join(stream_in, "c1.parquet")).schema

    def run():
        changes = spark.readStream.schema(schema).parquet(stream_in)
        stream_apply_cdc(
            changes,
            base,
            str(tmp_path / "ckpt"),
            key_cols=["k"],
            partition_col="day",
            delete_col="is_delete",
            seq_col="seq",
        ).awaitTermination()

    run()
    first = _table(spark, base)
    # restart over the same checkpoint: no new files -> no re-apply; and the
    # merge itself is idempotent even if a batch were replayed
    run()
    assert _table(spark, base) == first == {
        (1, "d1"): "a", (2, "d1"): "B", (3, "d2"): "c",
    }


def test_collapse_changes_keeps_latest_per_key(spark):
    batch = spark.createDataFrame(
        [
            (1, "d1", "old", False, 1),
            (1, "d1", "new", False, 5),
            (2, "d1", "x", False, 3),
            (2, "d1", None, True, 9),  # delete wins: highest seq
        ],
        "k long, day string, v string, is_delete boolean, seq long",
    )
    rows = {r.k: r for r in collapse_changes(batch, ["k"], "seq").collect()}
    assert rows[1].v == "new" and not rows[1].is_delete
    assert rows[2].is_delete
