"""Multimodal (image/audio/video) column handling for training-data pipelines.

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside; all per-item compute (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` — one Python worker per
partition, vectorized batches, never row-at-a-time UDFs. At 100 TB the binary
column dominates I/O, so operators must (a) prune it from the scan when only
metadata is needed (Catalyst column pruning does this for free because metadata
lives in separate columns, not inside the blob) and (b) size partitions by
bytes, not rows (``spark.sql.files.maxPartitionBytes``).

The actual codecs (PIL/ffmpeg/soundfile) are NOT available in this container:
``decode_image`` is stubbed behind an import-try with a clearly-marked
deterministic fake, so the Spark-side plumbing — schema, UDF signature, batch
iteration, partition behavior — is real and tested while the pixel math is not.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for a media asset (parallels common dataset-format practice:
# payload blob + sidecar metadata columns).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _make_decoder():
    """Build the payload decoder as a self-contained closure.

    Returned function is defined with no references into this module so
    cloudpickle ships it BY VALUE to executor Python workers — the workers must
    not need ``parqueryd_spark`` importable (the engine may be driven from any
    cwd without addPyFile).
    """

    def decode(payload: bytes) -> tuple[int, int, list[float]]:
        # STUB: real decoding requires an image codec (PIL / opencv), not
        # present in this environment. Falls back to a deterministic fake
        # derived from the payload digest so the pipeline stays testable.
        import hashlib as _hashlib

        try:
            import PIL.Image  # noqa: F401

            raise NotImplementedError(
                "real image decode path not implemented in this environment"
            )
        except ImportError:
            h = _hashlib.sha256(payload).digest()
            width = 1 + h[0] % 64
            height = 1 + h[1] % 64
            feature = [b / 255.0 for b in h[2:10]]
            return width, height, feature

    return decode


# driver-side convenience (same function the executors run)
decode_image = _make_decoder()


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: utf-8 text bytes stand in
    for the binary payload (deterministic), with metadata computed JVM-side."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.md5(payload).alias("digest"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize every payload to (width, height) via mapInPandas.

    STUB codec: the fake 'resized' payload is a deterministic digest of
    (payload, dims) so downstream plumbing (dedup on resized bytes, size
    accounting) is exercised without a real image library.
    """

    def _resize(batches):
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            payloads = [
                _hl.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "width": _pd.array([width] * len(pdf), dtype="int32"),
                    "height": _pd.array([height] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Sample up to ``max_frames`` frames per video payload (1-in/N-out row
    explosion through mapInPandas — the batch shape a real ffmpeg frame
    sampler needs). STUB: frame count derives from the payload digest; each
    fake frame is a per-index digest."""

    def _sample(batches):
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, mtype, p in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mtype != "video":
                    continue
                raw = bytes(p)
                n = 1 + _hl.sha256(raw).digest()[0] % max_frames
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(_hl.sha256(raw + bytes([i])).digest())
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="int64"),
                    "frame_index": _pd.array(idxs, dtype="int32"),
                    "frame_payload": frames,
                }
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over the payload column.

    The iterator-of-batches signature keeps memory bounded regardless of
    partition size; each batch is an Arrow-backed pandas DataFrame.
    """

    decode = _make_decoder()  # closure pickled by value; no module import on workers

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for payload in pdf["payload"]:
                w, h, f = decode(bytes(payload))
                widths.append(w)
                heights.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "digest": pdf["digest"],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
