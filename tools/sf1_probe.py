"""sf1 bench probe (VERDICT r10 item #2): measure the headline bench rows at
sf0.1 AND at a materialized ~sf1 (10x) database, in one process, and report
per-row wall ratios — the empirical check that no headline plan is
super-linear beyond shuffle growth.

The sf1 database is 10 key-shifted replicas of every scaled table sharing the
fixed nation/region dims, so each replica is an independent sub-database and
every join's structure is preserved exactly at 10x the rows:

- customer/orders/lineitem/part/supplier: every key column shifts by
  ``replica * (max_key + 1)`` with CONSISTENT strides across tables
  (o_custkey shifts with customer's stride, l_orderkey with orders', ...).
- events: event_id and user_id shift (10x users, same per-user density —
  sessionization/gap-fill workloads scale by user count, the real-world way).
- documents: doc_id shifts and every token gets a per-replica prefix, so
  documents stay globally distinct (dedup rows must not see 10 exact copies)
  while each replica keeps sf0.1's implanted near-dup structure; n_chars is
  recomputed from the rewritten text.
- embeddings: vec_id shifts and replica i applies a deterministic Rademacher
  sign pattern — intra-replica cosines are preserved EXACTLY, cross-replica
  cosines concentrate near 0 (see tools/scale_probe.py for the derivation).

Query vectors stay the fixed serving set (vec_id < 5 / first 8), so the ANN
rows measure a constant query load against a 10x corpus — the serving regime.

Run:  python /root/repo/tools/sf1_probe.py [trials]
Writes nothing under /root/repo; scratch lives in /tmp/spark_graft_sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_sf1"
FACTOR = 10


def _read(spark, name):
    return spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))


def _stride(df, col) -> int:
    from pyspark.sql import functions as F

    return int(df.agg(F.max(col)).first()[0]) + 1


def _replicas(df, shifts: dict[str, int], factor: int):
    """Union ``factor`` copies with each key column shifted by i * stride."""
    from pyspark.sql import functions as F

    parts = []
    for i in range(factor):
        rep = df
        for col, stride in shifts.items():
            rep = rep.withColumn(col, F.col(col) + F.lit(i * stride))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_sf1(spark) -> str:
    from pyspark.sql import functions as F

    os.makedirs(SCRATCH, exist_ok=True)
    marker = os.path.join(SCRATCH, "_COMPLETE")
    if os.path.exists(marker):
        return SCRATCH

    cust, orders, li = _read(spark, "customer"), _read(spark, "orders"), _read(spark, "lineitem")
    part, supp, ev = _read(spark, "part"), _read(spark, "supplier"), _read(spark, "events")
    docs, emb = _read(spark, "documents"), _read(spark, "embeddings")

    s_cust = _stride(cust, "c_custkey")
    s_ord = _stride(orders, "o_orderkey")
    s_part = _stride(part, "p_partkey")
    s_supp = _stride(supp, "s_suppkey")
    s_ev = _stride(ev, "event_id")
    s_user = _stride(ev, "user_id")
    s_doc = _stride(docs, "doc_id")
    s_vec = _stride(emb, "vec_id")

    plans = {
        "customer": _replicas(cust, {"c_custkey": s_cust}, FACTOR),
        "orders": _replicas(orders, {"o_orderkey": s_ord, "o_custkey": s_cust}, FACTOR),
        "lineitem": _replicas(
            li, {"l_orderkey": s_ord, "l_partkey": s_part, "l_suppkey": s_supp}, FACTOR
        ),
        "part": _replicas(part, {"p_partkey": s_part}, FACTOR),
        "supplier": _replicas(supp, {"s_suppkey": s_supp}, FACTOR),
        "events": _replicas(ev, {"event_id": s_ev, "user_id": s_user}, FACTOR),
        "nation": _read(spark, "nation"),
        "region": _read(spark, "region"),
    }
    # documents: shift ids + per-replica token prefix, recompute n_chars
    doc_parts = []
    for i in range(FACTOR):
        text = F.array_join(
            F.transform(F.split("text", " "), lambda t: F.concat(F.lit(f"r{i}"), t)), " "
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * s_doc)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        )
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    plans["documents"] = out
    # embeddings: shift ids + per-replica Rademacher sign flip
    emb_parts = []
    for i in range(FACTOR):
        flipped = F.transform(
            "embedding",
            lambda x, idx: x
            * F.when(
                F.pmod(F.xxhash64(F.lit(i), idx), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ).cast("array<float>")
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * s_vec)).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
    out = emb_parts[0]
    for p in emb_parts[1:]:
        out = out.unionByName(p)
    plans["embeddings"] = out

    for name, df in plans.items():
        df.write.mode("overwrite").parquet(os.path.join(SCRATCH, f"{name}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return SCRATCH


# Non-bench rows that still need a 10x measurement (VERDICT r13 item #4):
# every model-SERVING family — NB classifier scoring, grouped heavy hitters,
# KN LM scoring (n=2 and the r14 n=3), and the frozen calibration gate —
# plus the r14 published-sketch-state serves. Probed with the same warm+min
# protocol as the bench rows.
EXTRA_ROWS = (
    "text_nb_langid",
    "text_heavy_hitters_by_lang",
    "text_kn_lm_score",
    "text_kn3_lm_score",
    "pipeline_calibration_serve",
    "events_kmv_served",
    "text_hh_served",
    "events_countmin_served",
    # r15 (VERDICT r14 item #5): the order-5 KN scorer (the deepest
    # level-derivation chain) gets an in-session 10x row; the two
    # post-compaction serves (events_kmv_compacted, text_lm_compacted_score)
    # are bench rows, so bench_queries() already carries them
    "text_kn5_lm_score",
)


def probe_rows(Q) -> dict:
    rows = dict(Q.bench_queries())
    for name in EXTRA_ROWS:
        rows[name] = Q.REGISTRY[name].fn
    return rows


def time_rows(spark, sf_dir: str, trials: int) -> dict[str, float]:
    from parqueryd_spark import queries as Q

    out = {}
    for name, fn in probe_rows(Q).items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
        print(f"  {sf_dir.split('/')[-1] or 'sf1'} {name}: {out[name]}s", flush=True)
    return out


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from parqueryd_spark.session import get_spark

    spark = get_spark("sf1_probe")
    print("building sf1 replicas...", flush=True)
    t0 = time.perf_counter()
    sf1_dir = build_sf1(spark)
    print(f"sf1 build: {time.perf_counter() - t0:.1f}s", flush=True)

    print("timing at sf0.1...", flush=True)
    base = time_rows(spark, BASE, trials)
    print("timing at sf1...", flush=True)
    big = time_rows(spark, sf1_dir, trials)

    print("\n| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for name in base:
        r = big[name] / base[name] if base[name] else float("nan")
        print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {r:.2f}x |")
    tot_b, tot_g = sum(base.values()), sum(big.values())
    print(f"| TOTAL | {tot_b:.2f} | {tot_g:.2f} | {tot_g / tot_b:.2f}x |")
    print(json.dumps({"sf01": base, "sf1": big}))
    spark.stop()


if __name__ == "__main__":
    main()
