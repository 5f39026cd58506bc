"""Sketch/quantization registry rows (past the 50-row gate window by design —
both produce engine-specific estimates; each is error/recall-bounded against
its exact twin in pytest, and the exact pipelines are the externally-oracled
anchors: `ann_bruteforce_topk` in-window for PQ, `text_ngram_stats`'s
frequency branch for the heavy-hitter sketch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table


@query("ann_pq_topk", oracle=None)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat PQ with ADC shortlist + exact re-rank (operators/quantization.py):
    16 subspaces × 16 codes compress each 64-dim float vector to 16 bytes
    (16× vs float32, 32× vs float64); search touches only codes until the
    refine×k shortlist is exactly re-ranked. The 100 TB memory tier below IVF
    bucket pruning. Deterministic: seeded sample training, first-min
    tie-breaks, neighbor-id-ordered windows. Recall vs exact brute force is
    DRIVER-gated via the oracle-backed, in-gate-window ann_pq_recall_bound
    (queries/estimates.py)."""
    from parqueryd_spark.operators.quantization import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.orderBy("vec_id").limit(8)
    return pq_topk(emb, queries_df, dim=64, k=5).orderBy("query_id", "rank")


@query("text_heavy_hitter_tokens", oracle=None)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (operators/sketches.py) over the corpus's
    token stream: top-20 most frequent tokens from bounded per-partition
    counters + one tiny merge shuffle, instead of shuffling every token
    occurrence. est_count <= true <= est_count + max_undercount is part of
    the result. Rows-only row (sketch estimates are engine-specific); the
    est <= true <= est+undercount invariant is DRIVER-gated via the
    oracle-backed heavy_hitter_bound (queries/estimates.py), asserted in
    tests/test_sketches.py, and the exact token-frequency pipeline is oracled
    in-window via text_ngram_stats' bigram branch."""
    from parqueryd_spark.operators import text as T
    from parqueryd_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    return heavy_hitters(toks, "token", k=20, capacity=1024)


_MIX_TARGETS = {"de": 0.25, "en": 0.25, "es": 0.25, "fr": 0.25}
_MIX_VALUES = ", ".join(f"('{d}', {w})" for d, w in _MIX_TARGETS.items())


@query(
    "pipeline_domain_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY lang
    ),
    t(lang, w) AS (VALUES {_MIX_VALUES}),
    scale AS (
      SELECT min(c / CAST(w AS DOUBLE)) AS s FROM counts JOIN t USING (lang)
    ),
    fr AS (
      SELECT lang, (s * CAST(w AS DOUBLE)) / c AS f, CAST(c AS BIGINT) AS n_total
      FROM counts JOIN t USING (lang), scale
    ),
    kept AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN fr ON d.lang = fr.lang
      WHERE CAST(('0x' || substr(md5(d.doc_id::VARCHAR || 'mixture'), 1, 8)) AS BIGINT)
            < CAST(floor(f * 4294967296.0) AS BIGINT)
      GROUP BY d.lang
    )
    SELECT fr.lang AS lang, n_total, n_kept,
           round(n_kept / CAST((SELECT sum(n_kept) FROM kept) AS DOUBLE), 4) AS kept_share
    FROM fr JOIN kept USING (lang)
    ORDER BY lang
    """,
)
def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the corpus to a target domain mixture (equal parts de/en/es/
    fr here; zh dropped as unlisted) via operators/sampling.resample_to_mixture:
    the limiting domain sets the achievable scale, every other domain
    downsamples deterministically through the shared md5-bucket machinery —
    no upsampling, no corpus shuffle, one metadata-scale count per domain.
    The oracle recomputes the identical IEEE-double fractions and md5
    thresholds, so n_kept matches EXACTLY, not statistically."""
    from parqueryd_spark.operators.sampling import resample_to_mixture

    docs = load_table(spark, sf_dir, "documents")
    kept = resample_to_mixture(docs, "lang", _MIX_TARGETS, "doc_id")
    per = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    all_kept = per.agg(F.sum("n_kept").alias("tk"))
    return (
        totals.join(per, "lang")
        .join(F.broadcast(all_kept))
        .select(
            "lang",
            "n_total",
            "n_kept",
            F.round(F.col("n_kept") / F.col("tk"), 4).alias("kept_share"),
        )
        .orderBy("lang")
    )
