"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed once to warm (JVM/codegen/file listing) and then timed;
timing includes full materialization (count + a bounded collect) so lazy plans
can't cheat.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


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
    for name, fn in bench.items():
        fn(spark, sf_dir).count()  # warm-up: JVM, codegen, file listing
        best = run_once(fn)
        if best < 2.0:  # fast queries: 2 more trials, report steady-state min
            best = min(best, run_once(fn), run_once(fn))
        else:  # slow queries: 2 more trials — ambient load moves a 2s+ query
            # by hundreds of ms, so one retry under-samples the steady state
            best = min(best, run_once(fn), run_once(fn))
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
