"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed once to warm (JVM/codegen/file listing) and then timed
over 5 trials; timing includes full materialization (noop sink) so lazy plans
can't cheat. ``queries`` reports the per-query MIN (steady-state, comparable
with BENCH_r1-r6); ``queries_median``/``queries_spread``/``queries_trials``
expose the median, max-min spread, and raw per-trial times so an ambient-load
swing on the shared host is distinguishable from a plan regression
(VERDICT r6 item #2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

TRIALS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from parqueryd_spark import queries as Q
    from parqueryd_spark.session import get_spark

    spark = get_spark("parqueryd_spark-bench")

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        # one full materialization of every result row, no driver collect cost
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    bench = Q.bench_queries()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    for name, fn in bench.items():
        fn(spark, sf_dir).count()  # warm-up: JVM, codegen, file listing, caches
        ts = [round(run_once(fn), 4) for _ in range(TRIALS)]  # execution order
        trials[name] = ts
        timings[name] = min(ts)
        medians[name] = round(statistics.median(ts), 4)
        spreads[name] = round(max(ts) - min(ts), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "queries_spread": spreads,
                "queries_trials": trials,
                "value_median": round(sum(medians.values()), 4),
                "trials_per_query": TRIALS,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
