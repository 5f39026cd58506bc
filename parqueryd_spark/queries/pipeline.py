"""Training-data pipeline composition: deterministic split -> stratified
sample -> contiguous sequence packing, as one oracle-checked query.

Every stage is a pure md5-derived function of doc_id (operators/sampling.py),
so the DuckDB oracle reproduces the exact split assignment, sample membership
and bin layout — cross-engine byte-equal, no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parqueryd_spark.operators import text as T
from parqueryd_spark.operators.dedup import contamination_stats
from parqueryd_spark.operators.sampling import (
    hash_split,
    pack_contiguous,
    split_threshold,
    stratified_sample,
)
from parqueryd_spark.queries import query
from parqueryd_spark.sources.parquet import load_table

_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SAMPLE_FRACS = {"train": 0.9, "val": 0.5, "test": 0.25}
_BUDGET = 2048

_T_TRAIN = split_threshold(0.8)
_T_VAL = split_threshold(0.9)
_S = {k: split_threshold(v) for k, v in _SAMPLE_FRACS.items()}


@query(
    "pipeline_split_pack",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents
    ),
    split AS (
      SELECT doc_id, tok,
             CASE WHEN CAST(('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8)) AS BIGINT)
                       < {_T_TRAIN} THEN 'train'
                  WHEN CAST(('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8)) AS BIGINT)
                       < {_T_VAL} THEN 'val'
                  ELSE 'test' END AS split
      FROM tok
    ),
    sampled AS (
      SELECT * FROM (
        SELECT *, CAST(('0x' || substr(md5(doc_id::VARCHAR || 'sample'), 1, 8)) AS BIGINT) AS sb
        FROM split
      )
      WHERE (split = 'train' AND sb < {_S["train"]})
         OR (split = 'val'   AND sb < {_S["val"]})
         OR (split = 'test'  AND sb < {_S["test"]})
    ),
    packed AS (
      SELECT split, doc_id, tok,
             CAST(floor((sum(tok) OVER (PARTITION BY split ORDER BY doc_id) - tok)
                        / {_BUDGET}.0) AS BIGINT) AS bin_id
      FROM sampled
    ),
    per_bin AS (
      SELECT split, bin_id, sum(tok) AS bin_tokens, count(*) AS bin_docs
      FROM packed GROUP BY split, bin_id
    ),
    counts AS (SELECT split, count(*) AS n_docs FROM split GROUP BY split)
    SELECT c.split                            AS split,
           c.n_docs                           AS n_docs,
           CAST(sum(p.bin_docs) AS BIGINT)    AS n_sampled,
           count(*)                           AS n_bins,
           CAST(sum(p.bin_tokens) AS BIGINT)  AS sum_tokens,
           CAST(max(p.bin_tokens) AS BIGINT)  AS max_bin_tokens,
           max(p.bin_docs)                    AS max_bin_docs
    FROM per_bin p JOIN counts c USING (split)
    GROUP BY c.split, c.n_docs
    """,
)
def pipeline_split_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical curation tail of a training-data pipeline: 80/10/10
    deterministic split, per-split stratified sampling (train 0.9 / val 0.5 /
    test 0.25), then contiguous packing of whitespace-token counts into
    2048-token bins within each split. Reported per split: doc count, sampled
    count, bin count, token totals, and the fullest bin — everything the
    oracle recomputes exactly from md5 arithmetic."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").alias("tok")
    )
    split_df = hash_split(docs, "doc_id", _WEIGHTS, salt="split")
    sampled = stratified_sample(
        split_df, "doc_id", _SAMPLE_FRACS, strata_col="split", salt="sample"
    )
    packed = pack_contiguous(sampled, "doc_id", "tok", _BUDGET, group_cols=["split"])
    per_bin = packed.groupBy("split", "bin_id").agg(
        F.sum("tok").alias("bin_tokens"), F.count("*").alias("bin_docs")
    )
    counts = split_df.groupBy("split").agg(F.count("*").alias("n_docs"))
    return (
        per_bin.groupBy("split")
        .agg(
            F.sum("bin_docs").cast("long").alias("n_sampled"),
            F.count("*").alias("n_bins"),
            F.sum("bin_tokens").cast("long").alias("sum_tokens"),
            F.max("bin_tokens").cast("long").alias("max_bin_tokens"),
            F.max("bin_docs").alias("max_bin_docs"),
        )
        .join(F.broadcast(counts), "split")
        .select(
            "split", "n_docs", "n_sampled", "n_bins",
            "sum_tokens", "max_bin_tokens", "max_bin_docs",
        )
    )


@query(
    "pipeline_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_distinct(list_transform(
                         range(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                  ELSE [text] END AS gs
      FROM toks
    ),
    bench AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 20 = 0),
    corp AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 20 <> 0)
    SELECT c.doc_id AS doc_id,
           count(*) AS n_grams,
           count(b.g) AS n_hits,
           count(b.g) >= 1 AS contaminated
    FROM corp c LEFT JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination over the documents table: docs with
    doc_id % 20 == 0 stand in for an eval benchmark, the rest are the training
    corpus, and every training doc is scored by how many of its distinct
    trigram shingles collide with the benchmark's shingle set
    (operators/dedup.py contamination_stats — broadcast benchmark grams,
    xxhash64 long join keys, corpus never shuffled by gram). Emits
    (doc_id, n_grams, n_hits, contaminated) for every training doc; the
    oracle reproduces the collision counts with string-gram joins, which are
    equivalent because xxhash64 equality on equal strings is exact."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return contamination_stats(corpus, bench, "doc_id", "text", k=3).select(
        F.col("doc").alias("doc_id"), "n_grams", "n_hits", "contaminated"
    )


@query(
    "pipeline_bloom_decontaminate",
    bench=True,
    oracle="""
    WITH bench AS (
      SELECT doc_id AS b_id, text FROM documents WHERE doc_id % 20 = 0
    ),
    corpus AS (
      SELECT c.doc_id, c.source, c.n_chars, coalesce(b.text, c.text) AS text
      FROM (SELECT *, CASE WHEN doc_id % 9 = 1
                           THEN doc_id - doc_id % 20 END AS b_id
            FROM documents WHERE doc_id % 20 <> 0) c
      LEFT JOIN bench b USING (b_id)
    )
    SELECT source,
           count(*) AS n_clean,
           CAST(sum(n_chars) AS BIGINT) AS chars_clean
    FROM corpus
    WHERE text NOT IN (SELECT text FROM bench)
    GROUP BY source
    """,
)
def pipeline_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level decontamination served by the Bloom runtime filter
    (operators/membership.py bloom_anti_join): docs with doc_id % 20 == 0 are
    the eval benchmark; the training corpus is the rest, with leakage
    injected deterministically (every doc_id % 9 == 1 doc takes the text of
    the bench doc at its floor-of-20 id, mirrored in the oracle). The anti
    join is EXACT — probe misses never shuffle, the maybe-fraction is
    verified against the real key set — so the oracle is a plain NOT IN.
    Complements pipeline_decontaminate (gram-overlap scoring, broadcast gram
    set): the bloom route is the shape for benchmark sets too big to
    broadcast raw, at ~1.2 bytes per key."""
    from parqueryd_spark.operators.membership import bloom_anti_join

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = (
        docs.filter(F.col("doc_id") % 20 != 0)
        .withColumn(
            "b_id",
            F.when(F.col("doc_id") % 9 == 1, F.col("doc_id") - F.col("doc_id") % 20),
        )
        .join(
            bench.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text")),
            "b_id",
            "left",
        )
        .select("doc_id", "source", "n_chars", F.coalesce("b_text", "text").alias("text"))
    )
    clean = bloom_anti_join(corpus, bench.select("text"), "text", fpp=0.01)
    return clean.groupBy("source").agg(
        F.count("*").alias("n_clean"),
        F.sum("n_chars").cast("bigint").alias("chars_clean"),
    )


@query(
    "pipeline_k_anonymity",
    oracle="""
    WITH sizes AS (
      SELECT user_id, event_type, count(*) AS group_size
      FROM events GROUP BY user_id, event_type
    )
    SELECT CAST(count(CASE WHEN group_size < 3 THEN 1 END) AS BIGINT) AS n_violating_groups,
           CAST(coalesce(sum(CASE WHEN group_size < 3 THEN group_size END), 0) AS BIGINT)
             AS n_suppressed_rows,
           CAST(coalesce(sum(CASE WHEN group_size >= 3 THEN group_size END), 0) AS BIGINT)
             AS n_kept_rows
    FROM sizes
    """,
)
def pipeline_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity enforcement report (operators/pii.py): treating
    (user_id, event_type) as the quasi-identifier, count the combinations a
    k=3 release would re-identify, the rows suppression drops, and the rows
    kept — kept is computed through the ACTUAL anti-join operator
    (k_anonymize), so the oracle cross-checks the enforcement path, not
    just the violation count."""
    from parqueryd_spark.operators.pii import k_anonymity_violations, k_anonymize

    ev = load_table(spark, sf_dir, "events")
    quasi = ["user_id", "event_type"]
    viol = k_anonymity_violations(ev, quasi, k=3)
    kept = k_anonymize(ev, quasi, k=3)
    report = viol.agg(
        F.count(F.lit(1)).alias("n_violating_groups"),
        F.coalesce(F.sum("group_size"), F.lit(0)).cast("long").alias("n_suppressed_rows"),
    )
    return report.crossJoin(
        F.broadcast(kept.agg(F.count(F.lit(1)).alias("n_kept_rows")))
    )
