"""sf10 (100x) mini-probe — the second scale datapoint (VERDICT r14 item #4).

All prior scaling claims rest on one 10x measurement (sf0.1 -> sf1); the bar
asks about 100x. This probe materializes a ~sf10 database for ONLY the tables
the scale-critical rows touch and times those rows at sf0.1, sf1, AND sf10 in
one session, so each row gets a fitted growth curve (two ratio points) instead
of a single ratio — a super-linear term invisible at 10x shows up as
ratio(100x) >> ratio(10x)^2.

Scope is deliberately reduced (128 GiB single-host budget; BENCH_NOTES_r15
records the posture): the probed rows are the five families VERDICT r14 named
scale-critical — LSH near-dup (documents), exact-rank quantiles (events),
substring dedup (documents), the salted skew join (lineitem x orders), and
order-3 KN scoring (documents) — plus the two r15 probe-hygiene rows. Every
other bench row keeps its sf1-only evidence; dropped tables (customer, part,
supplier, embeddings) are logged at build time.

Replica construction is sf1_probe's key-shift scheme at FACTOR=100: each
replica is an independent sub-database (consistent key strides; documents get
per-replica token prefixes so near-dup structure is preserved within replicas
and absent across them — dedup rows must never see 100 exact copies).

Run:  python /root/repo/tools/sf10_probe.py [trials]
Writes nothing under /root/repo; scratch lives in /tmp/spark_graft_sf10
(~2 GB parquet) plus sf1_probe's /tmp/spark_graft_sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.sf1_probe import BASE, _read, _replicas, _stride, build_sf1  # noqa: E402

SCRATCH10 = "/tmp/spark_graft_sf10"
FACTOR10 = 100

# the five scale-critical families (VERDICT r14 item #4) + the two r15
# probe-hygiene rows (item #5) that serve from documents/events state
PROBE_ROWS = (
    "dedup_minhash_lsh",
    "events_exact_quantile_by_type",
    "dedup_substrings",
    "skew_salted_join",
    "text_kn3_lm_score",
    "text_kn5_lm_score",
    "events_kmv_compacted",
    "text_lm_compacted_score",
)

# only what the probed rows scan; everything else is skipped on purpose
TABLES10 = ("documents", "events", "lineitem", "orders")


def build_sf10(spark) -> str:
    from pyspark.sql import functions as F

    os.makedirs(SCRATCH10, exist_ok=True)
    marker = os.path.join(SCRATCH10, "_COMPLETE")
    if os.path.exists(marker):
        return SCRATCH10

    print(f"building sf10: tables {TABLES10} at {FACTOR10}x; "
          f"dropped (unused by probe rows): customer, part, supplier, "
          f"nation, region, embeddings", flush=True)

    orders, li, ev = _read(spark, "orders"), _read(spark, "lineitem"), _read(spark, "events")
    docs = _read(spark, "documents")
    s_ord = _stride(orders, "o_orderkey")
    s_cust = _stride(orders, "o_custkey")
    s_part = _stride(li, "l_partkey")
    s_supp = _stride(li, "l_suppkey")
    s_ev = _stride(ev, "event_id")
    s_user = _stride(ev, "user_id")
    s_doc = _stride(docs, "doc_id")

    plans = {
        "orders": _replicas(orders, {"o_orderkey": s_ord, "o_custkey": s_cust}, FACTOR10),
        "lineitem": _replicas(
            li, {"l_orderkey": s_ord, "l_partkey": s_part, "l_suppkey": s_supp}, FACTOR10
        ),
        "events": _replicas(ev, {"event_id": s_ev, "user_id": s_user}, FACTOR10),
    }
    # documents: shift ids + per-replica token prefix (sf1_probe's scheme),
    # n_chars recomputed from the rewritten text
    doc_parts = []
    for i in range(FACTOR10):
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

    for name, df in plans.items():
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(os.path.join(SCRATCH10, f"{name}.parquet"))
        print(f"  {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    with open(marker, "w") as fh:
        fh.write("ok")
    return SCRATCH10


def time_rows(spark, sf_dir: str, trials: int, label: str) -> dict[str, float]:
    from parqueryd_spark import queries as Q

    out = {}
    for name in PROBE_ROWS:
        fn = Q.REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
        print(f"  {label} {name}: {out[name]}s", flush=True)
    return out


# r16 (VERDICT r15 item #8): per-row CORE-scaling evidence at a scale where
# rows are compute-bound rather than job-overhead-bound. The sf0.1 8v32
# ratios were ~1 because every row is fixed-overhead dominated there; at
# sf10 the top wall-clock rows have real parallel work, so ratio ~ core
# ratio is the claim to check. Run the probe twice (scratch reused via the
# _COMPLETE marker):
#     SPARK_GRAFT_CPUS=32 python tools/sf10_probe.py 2 --cores-pair
#     SPARK_GRAFT_CPUS=8  python tools/sf10_probe.py 2 --cores-pair
PAIR_ROWS = (
    "dedup_substrings",
    "text_kn5_lm_score",
    "skew_salted_join",
    "dedup_minhash_lsh",
    "events_exact_quantile_by_type",
)


def cores_pair(trials: int) -> None:
    from parqueryd_spark import queries as Q
    from parqueryd_spark.session import get_spark

    spark = get_spark("sf10_probe_cores")
    cores = spark.sparkContext.master
    sf10_dir = build_sf10(spark)
    out = {}
    for name in PAIR_ROWS:
        fn = Q.REGISTRY[name].fn
        fn(spark, sf10_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(spark, sf10_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
        print(f"  sf10 {cores} {name}: {out[name]}s", flush=True)
    print(json.dumps({"master": cores, "sf10_rows": out}))
    spark.stop()


def main() -> None:
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    trials = int(nums[0]) if nums else 2
    if "--cores-pair" in sys.argv:
        cores_pair(trials)
        return
    from parqueryd_spark.session import get_spark

    spark = get_spark("sf10_probe")
    t0 = time.perf_counter()
    sf1_dir = build_sf1(spark)
    print(f"sf1 ready: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    sf10_dir = build_sf10(spark)
    print(f"sf10 ready: {time.perf_counter() - t0:.1f}s", flush=True)

    print("timing at sf0.1...", flush=True)
    base = time_rows(spark, BASE, trials, "sf0.1")
    print("timing at sf1...", flush=True)
    mid = time_rows(spark, sf1_dir, trials, "sf1")
    print("timing at sf10...", flush=True)
    big = time_rows(spark, sf10_dir, trials, "sf10")

    print("\n| query | sf0.1 s | sf1 s | sf10 s | r10x | r100x | r100x/r10x^2 |")
    print("|---|---|---|---|---|---|---|")
    for name in PROBE_ROWS:
        r10 = mid[name] / base[name] if base[name] else float("nan")
        r100 = big[name] / base[name] if base[name] else float("nan")
        # < 1: sublinear beyond the 10x trend; ~1: the 10x ratio extrapolates
        # (cost ~ data^log10(r10)); >> 1: a super-linear term the 10x probe
        # could not see
        curv = r100 / (r10 * r10) if r10 else float("nan")
        print(f"| {name} | {base[name]:.2f} | {mid[name]:.2f} | {big[name]:.2f} "
              f"| {r10:.2f}x | {r100:.2f}x | {curv:.2f} |")
    tb, tm, tg = sum(base.values()), sum(mid.values()), sum(big.values())
    print(f"| TOTAL | {tb:.2f} | {tm:.2f} | {tg:.2f} | {tm/tb:.2f}x | {tg/tb:.2f}x | "
          f"{(tg/tb)/((tm/tb)**2):.2f} |")
    print(json.dumps({"sf01": base, "sf1": mid, "sf10": big}))
    spark.stop()


if __name__ == "__main__":
    main()
