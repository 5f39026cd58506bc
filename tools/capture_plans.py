"""Capture .explain("formatted") for bench queries into plans/<round>/ 
(default r16; override with $SPARK_GRAFT_PLANS_ROUND).

Usage: python tools/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' (file name suffix)
  names:  optional subset; default = every bench row.

Plans are captured at sf0.1 (the bench SF) on the same session posture as
bench.py, so Exchange counts / join strategies / PushedFilters match what the
bench times. Explain-only — nothing is executed (rows that materialize eagerly
at plan-build time, e.g. the narrowing-pass collects, do run their driver-side
jobs; that is inherent to their design and still cheap at capture time).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parqueryd_spark import queries as Q
    from parqueryd_spark.session import get_spark

    spark = get_spark("parqueryd_spark-plans")
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)

    bench = Q.bench_queries()
    names = [n for n in bench if not only or n in only]
    for name in names:
        try:
            df = bench[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure so a broken row is visible
            plan = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
