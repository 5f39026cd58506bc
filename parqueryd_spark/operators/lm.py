"""N-gram language-model quality scoring (north-star scope: the CCNet-style
curation signal — Wenzek et al. 2020 score documents with an LM and keep the
low-perplexity tail; Gopher/RefinedWeb use the same signal as a filter).

The classic pipeline trains KenLM offline and scores with a per-row UDF. The
Spark-first shape keeps BOTH halves inside the engine as plain relational
plans over built-in functions:

- **train** is one map-side-combined count aggregation over exploded bigram
  occurrences — the LM *is* a DataFrame of (gram, count) rows. Context counts
  and the vocabulary size DERIVE from that table (two tiny re-aggregations,
  never a second scan of the text), so a 100 TB corpus is read exactly once.
- **score** is a groupBy + two equi-joins + one aggregation: per-document
  gram multiplicities join the count tables, and the smoothed log-probability
  is pure Column arithmetic (log2 of an exact integer ratio). Zero Python in
  either path; AQE broadcasts the count tables when they are small and
  shuffle-joins them when the vocabulary is genuinely large.
- **counts are linear**, so incremental training is `lm_merge` (sum matching
  gram rows — associative, commutative, bit-exact), the same contract as the
  Count-Min/KMV/HLL sketch family (operators/sketches.py) and the streaming
  maintenance face in streaming/lm.py.

Model: add-k smoothed bigram LM over whitespace tokens (the corpus'
single-space convention, operators/text.py):

    P(t | prev) = (c(prev t) + k) / (c(prev ·) + k·V),   V = |vocab| + 1

with V derived from the bigram table's distinct second tokens (+1 reserves
mass for out-of-vocabulary tokens). Scores are deterministic integer-count
arithmetic + log2, so a SQL oracle reproduces per-document cross-entropy to
6 dp — the registry row value-checks the ESTIMATES themselves, not a bound.

Reference parity note: the reference engine (parqueryd) has no LM scoring —
this family is north-star pipeline scope (BASELINE.json), same tier as
dedup/decontamination.

Relationship to operators/text.py:bigram_logprob (deliberate split, not
duplication): that function is the INLINE same-corpus scorer — inner joins,
so it can only score documents whose grams exist in the corpus it was
handed, in one shot. This module is the model LIFECYCLE: train on a
reference corpus, persist/merge/stream-maintain the counts, and score
ARBITRARY held-out text (left joins + add-k OOV mass — the unseen-gram path
bigram_logprob's inner joins cannot take). CCNet trains on Wikipedia and
scores Common Crawl; that train-here-score-there shape is what this module
adds.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parqueryd_spark.operators.text import ngrams_all


@dataclass
class BigramLM:
    """A trained bigram LM: three small-schema DataFrames.

    ``bigrams``  — (gram string "prev tok", c bigint): occurrence counts.
    ``contexts`` — (prev, cc bigint): per-context totals (Σ over second token).
    ``vocab``    — exactly one row (vsz bigint): distinct second tokens + 1.

    All three derive from one scan of the training text; ``contexts`` and
    ``vocab`` re-aggregate the (already tiny relative to the corpus) bigram
    table. Persist ``bigrams`` and re-derive the other two on load, or
    persist all three — both are O(distinct bigrams), never O(corpus).
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame
    k: float = 0.5


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(gram, c) occurrence counts — the linear, mergeable unit of the LM.

    One explode + one map-side-combined groupBy: the shuffle carries
    (gram, partial-count) pairs, proportional to DISTINCT grams per
    partition, not to corpus token volume.
    """
    grams = docs.select(F.explode(ngrams_all(F.col(text_col), 2)).alias("gram"))
    return grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("c"))


def _derive(bigrams: DataFrame, k: float) -> BigramLM:
    contexts = (
        bigrams.withColumn("prev", F.split("gram", " ")[0])
        .groupBy("prev")
        .agg(F.sum("c").cast("long").alias("cc"))
    )
    vocab = bigrams.select(F.split("gram", " ")[1].alias("tok")).agg(
        (F.countDistinct("tok") + F.lit(1)).cast("long").alias("vsz")
    )
    return BigramLM(bigrams=bigrams, contexts=contexts, vocab=vocab, k=k)


def lm_train(docs: DataFrame, text_col: str = "text", k: float = 0.5) -> BigramLM:
    """Train the add-k bigram LM: one corpus scan, everything else derived."""
    return _derive(bigram_counts(docs, text_col), k)


def lm_merge(parts: Sequence[DataFrame], k: float = 0.5) -> BigramLM:
    """Merge partial bigram-count tables (from ``bigram_counts`` over corpus
    increments) into one LM. Counts are linear, so merge = sum matching gram
    rows — bit-exact: merge(split(corpus)) ≡ train(corpus). This is the
    incremental-training face; streaming/lm.py persists the partials.
    """
    if not parts:
        raise ValueError("lm_merge needs at least one partial count table")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    total = merged.groupBy("gram").agg(F.sum("c").cast("long").alias("c"))
    return _derive(total, k)


def lm_score(
    docs: DataFrame,
    id_col: str,
    lm: BigramLM,
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy under the LM: (id, n_bigrams, avg_nll, ppl).

    - ``avg_nll``: mean negative log2-probability per bigram, rounded to 6 dp
      (per-doc sums are short, so cross-engine float-summation order cannot
      reach the 6th decimal — same contract as unigram_divergence).
    - ``ppl``: 2**avg_nll of the ROUNDED avg_nll, rounded to 4 dp, so both
      engines exponentiate the identical double.

    Documents with fewer than 2 tokens have no bigrams and are absent from
    the output (nothing to score — emitting 0 would fake a perfect score).

    Plan shape: per-doc gram multiplicities (groupBy doc+gram — collapses
    repeated grams BEFORE the join, so templated corpora join fewer rows),
    two left equi-joins against the count tables (unseen grams/contexts
    coalesce to 0 — the held-out path), one final per-doc aggregation.
    """
    grams = docs.select(
        F.col(id_col).alias("_id"), F.explode(ngrams_all(F.col(text_col), 2)).alias("gram")
    )
    weighted = grams.groupBy("_id", "gram").agg(F.count(F.lit(1)).cast("long").alias("w"))
    k = F.lit(lm.k)
    scored = (
        weighted.join(lm.bigrams, "gram", "left")
        .withColumn("prev", F.split("gram", " ")[0])
        .join(lm.contexts, "prev", "left")
        .crossJoin(F.broadcast(lm.vocab))
        .withColumn(
            "lp",
            F.log2(
                (F.coalesce(F.col("c"), F.lit(0)) + k)
                / (F.coalesce(F.col("cc"), F.lit(0)) + k * F.col("vsz"))
            ),
        )
    )
    avg_nll = F.round(-F.sum(F.col("w") * F.col("lp")) / F.sum("w"), 6)
    return (
        scored.groupBy("_id")
        .agg(
            F.sum("w").cast("long").alias("n_bigrams"),
            avg_nll.alias("avg_nll"),
            F.round(F.pow(F.lit(2.0), avg_nll), 4).alias("ppl"),
        )
        .withColumnRenamed("_id", id_col)
    )


def lm_publish(
    spark,
    lm_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    k: float = 0.5,
    batch: str = "base",
) -> None:
    """Persist the LM as a living dataset — the same publish/load/append
    posture as the ANN indexes (operators/squant.py:sq_publish): partial
    bigram counts land under ``<lm_dir>/counts/batch=<batch>`` (idempotent
    per-batch overwrite) and the smoothing constant under ``<lm_dir>/meta``.
    The served model is merge-on-read over ALL batches (linearity: ≡
    one-shot training on the concatenated corpus, bit-exact), so growing the
    training corpus is ``lm_append`` at O(increment) cost — the standing
    corpus is never re-scanned."""
    spark.createDataFrame([(float(k),)], "k double").write.mode("overwrite").parquet(
        f"{lm_dir}/meta"
    )
    (
        bigram_counts(docs, text_col)
        .withColumn("batch", F.lit(batch))
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(f"{lm_dir}/counts")
    )


def lm_append(
    spark, lm_dir: str, new_docs: DataFrame, batch: str, text_col: str = "text"
) -> None:
    """Incremental training: count ONLY the increment, land it as its own
    ``batch=<batch>`` partition (replays overwrite themselves)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        bigram_counts(new_docs, text_col)
        .withColumn("batch", F.lit(batch))
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(f"{lm_dir}/counts")
    )


def lm_load(spark, lm_dir: str) -> BigramLM:
    """The served LM: merge-on-read of every published count batch (the
    1-row meta collect is the only driver-side read)."""
    k = float(spark.read.parquet(f"{lm_dir}/meta").collect()[0]["k"])
    parts = spark.read.parquet(f"{lm_dir}/counts").drop("batch")
    return lm_merge([parts], k)
