"""Model-based document classification trained IN the engine: multinomial
Naive Bayes over hashed token features — the fasttext-style curation signal
(language ID, source/domain routing, quality-class filtering) as two
DataFrame plans, with no model file, no Python row loop, and no
engine-specific state: every number in both training and scoring is a
deterministic SQL expression over public md5 hashes, so an external engine
replays the trained model AND the per-document scores (the same auditability
contract as operators/sketches.py's md5_52 KMV and count-min).

Why NB and not logistic regression / a shipped model: training is pure
COUNTING — one groupBy over (class, bucket) token pairs — so it parallelizes
as a map-side-combined aggregation at any scale, retrains incrementally
(counts add across increments), and has a closed form an oracle can verify.
At 100 TB the model is a broadcast table of n_buckets x n_classes log-probs
(a few MB); scoring is explode -> broadcast join -> per-doc partial sum: one
shuffle of (doc, class, partial) rows, no state store, no iteration.

Reference scope note: the reference engine (SURVEY.md §0) has no
classification surface at all; this belongs to the north-star LLM-pipeline
extensions (curation: CCNet-style lang/quality routing before dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(token: Column, n_buckets: int, salt: str) -> Column:
    """Feature-hash a token into [0, n_buckets): first 8 md5 hex digits of
    ``token || ':' || salt`` mod n_buckets — the count-min cell convention,
    reproducible in DuckDB as
    CAST(('0x' || substr(md5(token || ':<salt>'), 1, 8)) AS BIGINT) % n."""
    h = F.md5(F.concat(token, F.lit(f":{salt}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "nb",
) -> DataFrame:
    """Train multinomial NB: returns the DENSE model table
    (label, bucket, logp, logprior) — n_classes x n_buckets rows, every
    bucket present (absent (class, bucket) counts smooth to alpha), so
    scoring is a plain equi-join with no missing-combination logic.

    logp     = ln((count(class, bucket) + alpha) / (tokens(class) + alpha*n))
    logprior = ln(docs(class) / docs(total))

    Counts are integers aggregated map-side; the only floats are final ln()
    of exact ratios, so the model is bit-reproducible anywhere. Training
    cost: one scan + one (class, bucket)-grain shuffle bounded by
    n_classes x n_buckets after partial aggregation — independent of corpus
    size. Incremental retrain = union count partials before the ln()
    (:func:`nb_count_partials` / :func:`nb_model_from_partials` — this
    function is exactly their one-increment composition)."""
    return nb_model_from_partials(
        nb_count_partials(docs, label_col, text_col, n_buckets, salt),
        n_buckets,
        alpha,
    )


def nb_count_partials(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "nb",
) -> DataFrame:
    """The model's SUFFICIENT STATISTICS for an increment, as one sparse
    count table (label, bucket, c): token counts per (class, hashed bucket)
    at bucket >= 0, plus ONE marker row per class at bucket = -1 carrying
    the increment's document count (the prior's numerator — the count-marker
    convention of the MG summaries' NULL row). Counts are integers, so
    partials from any partitioning of the corpus ADD to exactly the full
    corpus's statistics: incremental retraining is a union + sum, never a
    re-scan of history (:func:`nb_model_from_partials`)."""
    labeled = docs.where(F.col(label_col).isNotNull())
    tok = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(text_col, " ")).alias("token"),
    ).select("label", _bucket(F.col("token"), n_buckets, salt).alias("bucket"))
    token_counts = tok.groupBy("label", "bucket").agg(F.count("*").alias("c"))
    doc_counts = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("c")
    ).select("label", F.lit(-1).cast("int").alias("bucket"), "c")
    return token_counts.unionByName(doc_counts)


def nb_model_from_partials(
    partials: DataFrame,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Finalize any union of :func:`nb_count_partials` outputs into the
    dense scoring model — bit-identical to :func:`nb_train` over the
    concatenated corpus, because the only floats are final ln() of exact
    integer ratios and integer sums are associative. Cost ∝ the state size
    (classes x buckets), never the corpus."""
    merged = partials.groupBy("label", "bucket").agg(F.sum("c").alias("c"))
    token_counts = merged.where(F.col("bucket") >= 0)
    totals = token_counts.groupBy("label").agg(F.sum("c").alias("t"))
    n_docs = merged.where(F.col("bucket") == -1).select("label", F.col("c").alias("nd"))
    total_docs = n_docs.agg(F.sum("nd").alias("ndt"))
    buckets = partials.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    grid = totals.crossJoin(F.broadcast(buckets))
    model = (
        grid.join(token_counts, ["label", "bucket"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .select(
            "label",
            "bucket",
            F.log(
                (F.col("c") + F.lit(float(alpha)))
                / (F.col("t") + F.lit(float(alpha) * n_buckets))
            ).alias("logp"),
        )
    )
    priors = n_docs.join(F.broadcast(total_docs)).select(
        "label", F.log(F.col("nd") / F.col("ndt")).alias("logprior")
    )
    return model.join(F.broadcast(priors), "label")


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "nb",
) -> DataFrame:
    """Score every document against every class and pick the argmax:
    returns (id_col, label, score) — one row per document, score =
    logprior + Σ_tokens logp(bucket | class) quantized to micro-nats, ties
    broken by label asc so the cut is deterministic cross-engine.

    Plan shape: explode tokens -> bucket (pure Column) -> broadcast-join the
    dense model (n_buckets x n_classes rows) -> ONE partial-aggregated
    shuffle at (doc, class) grain -> per-doc max_by. Raw text crosses no
    shuffle; the shuffled rows carry only (id, label, partial-sum).

    Exactness contract (r15, retiring the 4-dp float-sum rounding vector):
    each model cell is quantized ONCE to an integer micro-nat value
    round(logp * 1e6) (HALF_UP — Spark round / DuckDB round / the pytest
    replay all round half away from zero), and the per-document score is an
    exact BIGINT sum of those integers — associative, order-independent,
    identical on any engine and any partitioning. The only float ever
    compared is score_n / 1e6 at the very end, derived from the same
    integer on both sides. The residual cross-engine vector is a single
    ln() call per MODEL CELL landing within ~1 ulp (~2e-9 at this
    magnitude) of a .5 quantization boundary — tests/test_classify.py
    asserts every cell of the actual gate model clears the boundary by
    > 1e-3, six orders above ulp noise, so the gate cannot flake."""
    logp_n = F.round(F.col("logp") * F.lit(1e6)).cast("long")
    logprior_n = F.round(F.col("logprior") * F.lit(1e6)).cast("long")
    tok = docs.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("token")
    ).select(id_col, _bucket(F.col("token"), n_buckets, salt).alias("bucket"))
    scored = (
        tok.join(F.broadcast(model), "bucket")
        .groupBy(id_col, "label")
        .agg((F.sum(logp_n) + F.first(logprior_n)).alias("score_n"))
    )
    # argmax without a window over the full doc set: max score per doc, then
    # a join back with a min(label) tiebreak — both sides are the same
    # (doc, class)-grain aggregate, map-side combined; the join key is the
    # exact integer score
    top = scored.groupBy(id_col).agg(F.max("score_n").alias("score_n"))
    return (
        scored.join(top, [id_col, "score_n"])
        .groupBy(id_col, "score_n")
        .agg(F.min("label").alias("label"))
        .select(id_col, "label", (F.col("score_n") / F.lit(1e6)).alias("score"))
    )
