"""Streaming ingest with incremental manifest maintenance
(streaming/manifest.py): every micro-batch lands idempotently, the published
zone-map manifest refreshes per trigger (O(new files)), serve-path pruned
reads equal full scans, and replays can't duplicate rows or strand manifest
entries."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from parqueryd_spark.streaming.manifest import read_pruned, stream_ingest_with_manifest


def _write_batch(stream_in: str, name: str, lo: int, hi: int) -> None:
    pd.DataFrame(
        {"k": range(lo, hi), "value": [float(x) for x in range(lo, hi)]}
    ).to_parquet(os.path.join(stream_in, name))


def test_stream_ingest_keeps_manifest_fresh_and_pruning_exact(spark, tmp_path):
    stream_in = str(tmp_path / "in")
    data_dir = str(tmp_path / "data")
    mdir = str(tmp_path / "mf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    _write_batch(stream_in, "b1.parquet", 0, 100)
    time.sleep(1.1)
    _write_batch(stream_in, "b2.parquet", 100, 200)

    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    q = stream_ingest_with_manifest(src, data_dir, mdir, ckpt)
    q.awaitTermination()

    # manifest covers exactly the live files
    from parqueryd_spark.sources.manifest import build_manifest

    live = spark.read.parquet(os.path.join(mdir, "live"))
    rebuilt = build_manifest(spark, data_dir)
    key = lambda r: (r.file, r.column)
    assert sorted(map(key, live.collect())) == sorted(map(key, rebuilt.collect()))

    # serve-path read == full filtered scan, and it actually prunes
    terms = [["value", ">=", 150.0]]
    got = sorted(r.k for r in read_pruned(spark, data_dir, mdir, terms).collect())
    assert got == list(range(150, 200))
    pruned = read_pruned(spark, data_dir, mdir, terms)
    full = spark.read.parquet(data_dir)
    assert len(pruned.inputFiles()) < len(full.inputFiles())

    # a later trigger refreshes incrementally; replay stays idempotent
    _write_batch(stream_in, "b3.parquet", 200, 300)
    q2 = stream_ingest_with_manifest(src, data_dir, mdir, ckpt)
    q2.awaitTermination()
    got2 = sorted(r.k for r in read_pruned(spark, data_dir, mdir, terms).collect())
    assert got2 == list(range(150, 300))
    assert spark.read.parquet(data_dir).count() == 300

    q3 = stream_ingest_with_manifest(src, data_dir, mdir, ckpt)  # no new input
    q3.awaitTermination()
    assert spark.read.parquet(data_dir).count() == 300
    live3 = spark.read.parquet(os.path.join(mdir, "live"))
    rebuilt3 = build_manifest(spark, data_dir)
    assert sorted(map(key, live3.collect())) == sorted(map(key, rebuilt3.collect()))


def test_mid_swap_staleness_is_safe_not_wrong(spark, tmp_path):
    """A reader holding LAST generation's manifest while new files land must
    still return exact results (round-9 staleness guard: uncovered live
    files are conservatively scanned)."""
    import shutil

    stream_in = str(tmp_path / "in")
    data_dir = str(tmp_path / "data")
    mdir = str(tmp_path / "mf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)
    _write_batch(stream_in, "b1.parquet", 0, 100)
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_ingest_with_manifest(src, data_dir, mdir, ckpt).awaitTermination()

    stale = str(tmp_path / "stale_mf")
    shutil.copytree(os.path.join(mdir, "live"), stale)

    _write_batch(stream_in, "b2.parquet", 100, 200)
    stream_ingest_with_manifest(src, data_dir, mdir, ckpt).awaitTermination()

    from parqueryd_spark.sources.manifest import scan_pruned

    got = sorted(
        r.k
        for r in scan_pruned(
            spark, data_dir, [["value", ">=", 50.0]], manifest=spark.read.parquet(stale)
        ).collect()
    )
    assert got == list(range(50, 200))  # b2's rows kept despite zero coverage


def test_stream_ingest_maintains_bloom_manifest(spark, tmp_path):
    """bloom_cols keeps a per-file Bloom manifest fresh alongside the zone
    map: point lookups on the unclustered key prune files, refreshes reuse
    the first generation's (n_bits, n_hashes), and results stay exact."""
    stream_in = str(tmp_path / "in")
    data_dir = str(tmp_path / "data")
    mdir = str(tmp_path / "mf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_in)

    # keys deliberately UNCLUSTERED across batches (interleaved mod-2 lanes)
    # so every file's [min, max] spans the domain and zone maps can't prune
    pd.DataFrame(
        {"k": list(range(0, 200, 2)), "value": [1.0] * 100}
    ).to_parquet(os.path.join(stream_in, "b1.parquet"))
    schema = spark.read.parquet(os.path.join(stream_in, "b1.parquet")).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_in)
    stream_ingest_with_manifest(src, data_dir, mdir, ckpt, bloom_cols=["k"]).awaitTermination()

    blive = os.path.join(mdir, "bloom=k", "live")
    assert os.path.isdir(blive)
    gen1 = spark.read.parquet(blive).select("n_bits", "n_hashes").limit(1).collect()[0]

    pd.DataFrame(
        {"k": list(range(1, 200, 2)), "value": [2.0] * 100}
    ).to_parquet(os.path.join(stream_in, "b2.parquet"))
    stream_ingest_with_manifest(src, data_dir, mdir, ckpt, bloom_cols=["k"]).awaitTermination()

    bm = spark.read.parquet(blive)
    # refresh covered the new batch and reused the sizing parameters
    assert bm.count() == 2
    params = {(int(r.n_bits), int(r.n_hashes)) for r in bm.collect()}
    assert params == {(int(gen1.n_bits), int(gen1.n_hashes))}

    # point lookup through read_pruned: exact result, bloom-pruned file set
    got = read_pruned(spark, data_dir, mdir, [["k", "==", 7]])
    assert [(r.k, r.value) for r in got.collect()] == [(7, 2.0)]
    assert len(got.inputFiles()) < len(spark.read.parquet(data_dir).inputFiles())
