"""The quality-gate lifecycle: calibrate per source, freeze, serve.

Raw quality scores (length, LM perplexity, ...) are not comparable across
sources — a "keep the top half" threshold on raw values keeps 90% of one
crawl and 5% of another. And recomputing ranks per batch lets each arriving
batch MOVE the gate. The production shape is three steps, all in-engine:

  1. SCORE every document (here: token count and Kneser-Ney LM perplexity —
     operators/lm.py:kn_score, the KenLM-standard smoothing served from the
     same published count table as the add-k model).
  2. CALIBRATE within source on a reference window
     (operators/quality.py:quantile_calibrate — percent_rank with
     deterministic tiebreaks), or reduce the window to its per-source
     empirical CDF (calibration_cdf) — a distinct-score-sized table you
     PUBLISH like any model artifact.
  3. SERVE new batches against the FROZEN CDF (calibration_score: a
     union + running-window step lookup, one shuffle, never a range join;
     stream_calibrate_scores is the same call per micro-batch).

The registry twins pipeline_quality_calibration / pipeline_calibration_serve
/ text_kn_lm_score put the identical plans under the driver's hash-equality
gate. Runnable:

    python examples/quality_gate_lifecycle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parqueryd_spark import get_spark
from parqueryd_spark.operators.lm import kn_score, lm_train
from parqueryd_spark.operators.quality import (
    calibration_cdf,
    calibration_score,
    quantile_calibrate,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("quality-gate-lifecycle")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # ---- 1. score: token count + KN perplexity against an in-corpus LM ----
    lm = lm_train(docs, "text", k=0.5)
    ppl = kn_score(docs, "doc_id", lm, "text").select("doc_id", "ppl")
    scored = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    ).join(ppl, "doc_id")

    # ---- 2. calibrate within source (reference window: doc_id < 400) ------
    ref_window = scored.filter(F.col("doc_id") < 400)
    calibrated = quantile_calibrate(ref_window, "source", "n_tokens", ["doc_id"])
    per_source_kept = (
        calibrated.filter(F.col("calib") >= 0.5).groupBy("source").count().orderBy("source")
    )
    print("reference window, docs in the top half of their OWN source:")
    for r in per_source_kept.limit(5).collect():
        print(f"  {r['source']}: {r['count']}")

    # the frozen artifact: one row per (source, distinct score)
    cdf = calibration_cdf(ref_window, "source", "n_tokens")
    print(f"published CDF rows: {cdf.count()} (distinct-score-sized, not corpus-sized)")

    # ---- 3. serve a NEW batch against the frozen gate ---------------------
    new_batch = scored.filter(F.col("doc_id") >= 400)
    served = calibration_score(cdf, new_batch, "source", "n_tokens", "doc_id")
    kept = served.filter(F.col("calib") >= 0.5)
    print(
        f"new batch: {new_batch.count()} docs, {kept.count()} pass the frozen gate "
        "(threshold did NOT move to fit the batch)"
    )

    # out-of-distribution check: scores below every reference value calibrate
    # to 0.0 instead of silently ranking inside the batch
    ood = served.filter(F.col("calib") == 0.0).count()
    print(f"below-all-reference (calib 0.0, OOD-low) docs in new batch: {ood}")

    spark.stop()


if __name__ == "__main__":
    main()
