"""Naive Bayes over hashed token features (operators/classify.py): separable
classes must classify correctly, the result must be partition-invariant, and
training must be incremental (counts add)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parqueryd_spark.operators.classify import nb_score, nb_train


def _corpus(spark, parts=4):
    rows = []
    for i in range(60):
        rows.append((i, "alpha beta beta gamma", "A"))
    for i in range(60, 120):
        rows.append((i, "delta epsilon epsilon zeta", "B"))
    # a few cross-talk docs so the classes aren't trivially disjoint
    for i in range(120, 126):
        rows.append((i, "alpha delta beta epsilon", "A" if i % 2 else "B"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").repartition(parts)


def test_nb_separable_classes_and_partition_invariance(spark):
    docs = _corpus(spark)
    model = nb_train(docs, "lang", n_buckets=64)
    pred = nb_score(docs, model, n_buckets=64)
    got = {r.doc_id: r.label for r in pred.collect()}
    # pure-class docs must all classify to their own class
    assert all(got[i] == "A" for i in range(60))
    assert all(got[i] == "B" for i in range(60, 120))

    # identical scores under a different partitioning (rounding inside the
    # argmax keeps float-sum order noise out of the decision)
    pred2 = nb_score(docs.repartition(13), nb_train(docs.repartition(1), "lang", n_buckets=64), n_buckets=64)
    got2 = {(r.doc_id, r.label, r.score) for r in pred2.collect()}
    assert got2 == {(r.doc_id, r.label, r.score) for r in pred.collect()}


def test_nb_model_is_dense_and_probabilities_normalize(spark):
    docs = _corpus(spark)
    n_buckets = 32
    model = nb_train(docs, "lang", n_buckets=n_buckets)
    rows = model.collect()
    # dense: every (class, bucket) combination exactly once
    assert len(rows) == 2 * n_buckets
    # per class: sum of exp(logp) over all buckets == 1 (Laplace smoothing)
    import math

    for lab in ("A", "B"):
        s = sum(math.exp(r.logp) for r in rows if r.label == lab)
        assert abs(s - 1.0) < 1e-9, (lab, s)


def test_nb_training_is_incremental_counts_add(spark):
    """Retraining on the union must equal merging nothing fancier than the
    corpora themselves — NB's closed form means train(a+b) is exactly the
    model of the concatenated corpus (the incremental-retrain contract)."""
    docs = _corpus(spark)
    a = docs.where(F.col("doc_id") < 63)
    b = docs.where(F.col("doc_id") >= 63)
    direct = {(r.label, r.bucket): (r.logp, r.logprior) for r in nb_train(docs, "lang", n_buckets=32).collect()}
    unioned = {(r.label, r.bucket): (r.logp, r.logprior) for r in nb_train(a.unionByName(b), "lang", n_buckets=32).collect()}
    assert direct == unioned


def test_nb_null_labels_excluded_from_training(spark):
    rows = [(1, "x y", "A"), (2, "x y", None), (3, "z w", "B")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = nb_train(docs, "lang", n_buckets=16)
    assert {r.label for r in model.collect()} == {"A", "B"}


def test_nb_gate_model_clears_quantization_boundaries(spark):
    """The r15 exactness contract's ONE residual cross-engine vector is a
    single ln() per model cell landing within ~1 ulp (~2e-9 at micro-nat
    magnitude) of a .5 quantization boundary, where Spark's and DuckDB's
    ln() could round the integer differently. This pins the ACTUAL gate
    model (sf0.01 documents, even-doc_id training half, n_buckets=1024 —
    exactly what text_nb_langid / text_nb_incremental score with): every
    logp and logprior cell's micro-nat value must clear the nearest .5
    boundary by > 1e-3 — six orders of magnitude above ulp noise. The
    corpus is a deterministic fixture, so this is a proof for the gate,
    not a probabilistic argument. (If testdata regeneration ever lands a
    cell inside the margin, this fails loudly BEFORE the driver gate can
    flake — change the quantization scale, don't widen the margin.)"""
    from tests.conftest import SF_CORRECT

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    model = nb_train(docs.where(F.col("doc_id") % 2 == 0), "lang", n_buckets=1024)
    dist = F.abs(F.abs(F.col("v") * 1e6 - F.floor(F.col("v") * 1e6)) - 0.5)
    cells = model.select(F.col("logp").alias("v")).unionByName(
        model.select(F.col("logprior").alias("v")).distinct()
    )
    min_margin = cells.select(F.min(dist).alias("m")).collect()[0]["m"]
    assert min_margin > 1e-3, (
        f"a model cell sits {min_margin} from a micro-nat rounding boundary "
        "— the cross-engine ln() ulp vector is live; rescale the quantization"
    )
