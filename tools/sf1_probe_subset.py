"""Targeted 10x probe for the rows whose operators changed in the r15
optimization round: same replica build and warm+min protocol as
tools/sf1_probe.py, restricted to the changed rows so the post-change scale
behavior is measured in-session without a full probe run.

Run:  python /root/repo/tools/sf1_probe_subset.py [trials] [row ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from sf1_probe import BASE, build_sf1  # noqa: E402 (sibling module)

DEFAULT_ROWS = (
    "events_exact_quantile",
    "events_exact_quantile_by_type",
    "events_anomaly_mad",
    "dedup_substrings",
    "dedup_ngram_capped",
    "ann_ivfpq_index_topk",
    "ann_ivfsq_index_topk",
    "text_token_lang_stats",
    "text_bm25_search",
)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rows = tuple(sys.argv[2:]) or DEFAULT_ROWS
    from parqueryd_spark import queries as Q
    from parqueryd_spark.session import get_spark

    spark = get_spark("sf1_probe_subset")
    print("building sf1 replicas...", flush=True)
    t0 = time.perf_counter()
    sf1_dir = build_sf1(spark)
    print(f"sf1 build: {time.perf_counter() - t0:.1f}s", flush=True)

    fns = {name: Q.REGISTRY[name].fn for name in rows}

    def time_rows(sf_dir: str) -> dict[str, float]:
        out = {}
        for name, fn in fns.items():
            spark.sparkContext.setJobDescription(f"probe {name} @ {sf_dir}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            best = None
            for _ in range(trials):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 4)
            print(f"  {sf_dir.rstrip('/').split('/')[-1]} {name}: {out[name]}s", flush=True)
        return out

    base = time_rows(BASE)
    big = time_rows(sf1_dir)
    print("\n| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for name in base:
        r = big[name] / base[name] if base[name] else float("nan")
        print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {r:.2f}x |")
    print(json.dumps({"sf01": base, "sf1": big}))
    spark.stop()


if __name__ == "__main__":
    main()
