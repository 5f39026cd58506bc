"""r16 stage-level profiling for dedup_substrings and dedup_spans (guide §1:
measure first — find WHICH stage carries the cost before touching anything).

Each sub-stage is materialized through the same noop sink as bench.py, twice
(min reported), at the SF dir given by $SPARK_GRAFT_SF_DIR. Stages overlap
(each includes its upstream), so read the deltas.
"""

from __future__ import annotations

import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

from parqueryd_spark.session import get_spark  # noqa: E402
from parqueryd_spark.sources.parquet import load_table  # noqa: E402


def t(spark, name, df, trials=2):
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(name)
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:45s} {best:7.3f}s", flush=True)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-dedup-r16")
    docs = load_table(spark, sf_dir, "documents")

    # ---- dedup_substrings (min_tokens=16 per the bench row) ----
    from parqueryd_spark.operators.dedup import (
        _cover,
        _mark_keepers,
        _substr_base,
        _substr_finish,
        _substr_windows,
    )
    from parqueryd_spark.queries.dedup import dedup_substrings as _unused  # noqa

    n = 16
    base = _substr_base(docs, "doc_id", "text")
    wins = _substr_windows(base, n)
    t(spark, "substr: windows (explode+digest)", wins)
    groups = (
        wins.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("_c"), F.min(F.struct("doc", "pos")).alias("keep"))
        .where(F.col("_c") >= 2)
    )
    t(spark, "substr: digest groups (dup only)", groups)
    marked = _mark_keepers(wins)
    t(spark, "substr: marked (join-back)", marked)
    dropped = (
        marked.select("doc", _cover(n), "is_keep")
        .groupBy("doc", "idx")
        .agg(F.max("is_keep").alias("_any_keep"))
        .where(~F.col("_any_keep"))
        .select("doc", "idx")
    )
    t(spark, "substr: dropped (cover explode+agg)", dropped)
    full = _substr_finish(base, dropped, "rebuild")
    t(spark, "substr: full rebuild", full)
    print("counts:", wins.count(), groups.count(), marked.count(), dropped.count(), flush=True)

    # ---- dedup_spans (span_tokens=3, rebuild='carry') ----
    from parqueryd_spark.operators.text import tokens

    span_tokens = 3
    toks = tokens(F.col("text"))
    n_spans = F.greatest(F.ceil(F.size(toks) / F.lit(span_tokens)), F.lit(1)).cast("int")
    units = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * span_tokens + 1, span_tokens)),
    )
    spans = docs.select(F.col("doc_id").alias("doc"), F.posexplode(units).alias("pos", "span")).withColumn(
        "digest", F.md5("span")
    )
    t(spark, "spans: explode+digest", spans)
    keepers = spans.groupBy("digest").agg(F.min(F.struct("doc", "pos")).alias("keep"))
    t(spark, "spans: keepers min(struct)", keepers)
    # packed-long variant for comparison (doc_id int-ranged in testdata)
    keepers_packed = (
        spans.groupBy("digest")
        .agg(F.min(F.col("doc").cast("long") * F.lit(2**32) + F.col("pos")).alias("pk"))
        .select("digest", (F.col("pk") / F.lit(2**32)).cast("long").alias("kdoc"),
                (F.col("pk") % F.lit(2**32)).cast("int").alias("kpos"))
    )
    t(spark, "spans: keepers packed-long", keepers_packed)
    marked2 = spans.join(keepers, "digest").withColumn(
        "is_kept",
        (F.col("doc") == F.col("keep.doc")) & (F.col("pos") == F.col("keep.pos")),
    )
    t(spark, "spans: marked (join-back)", marked2)
    fullspan = marked2.groupBy("doc").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("is_kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.when(F.col("is_kept"), F.struct("pos", "span")))),
                lambda s: s["span"],
            ),
        ).alias("dedup_text"),
    )
    t(spark, "spans: full carry rebuild", fullspan)
    print("span rows:", spans.count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
