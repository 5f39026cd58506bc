"""Multimodal queries: binary payload columns + metadata (north-star scope).

``multimodal_metadata`` exercises the full mapInPandas Arrow round trip and is
still oracle-checkable because the metadata arithmetic (byte length, md5) is
SQL-expressible; the stubbed decode outputs (width/height/feature) are excluded
from that query and covered rows-only in ``multimodal_features``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators.multimodal import extract_features, media_from_documents
from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table


@query(
    "multimodal_metadata",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END          AS media_type,
           count(*)                       AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text))                       AS n_distinct_payloads
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata aggregation over the media table, via the mapInPandas feature
    extractor (payload-derived columns pass through the Arrow batch path)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(media_from_documents(docs))
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum("byte_len").cast("long").alias("total_bytes"),
        F.countDistinct("digest").alias("n_distinct_payloads"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           1 + ((strpos('0123456789abcdef', substr(sha256(text), 1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(sha256(text), 2, 1)) - 1) % 64 AS width,
           1 + ((strpos('0123456789abcdef', substr(sha256(text), 3, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(sha256(text), 4, 1)) - 1) % 64 AS height
    FROM documents
    WHERE doc_id < 50
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-decoded per-asset features THROUGH the mapInPandas Arrow batch
    path, oracle-checked end-to-end: the stub derives width/height from
    sha256(payload) bytes, which DuckDB reproduces with hex-digit arithmetic
    on sha256(text) — so the whole Python UDF round trip (schema, batching,
    closure shipping) is value-verified, not just schema-checked. A real
    codec replaces the decoder stub without touching the plumbing."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    feats = extract_features(media_from_documents(docs))
    return feats.select("media_id", "media_type", "byte_len", "width", "height")
