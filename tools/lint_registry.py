"""Lint every registry query's physical plan against the scale rules
(parqueryd_spark.plans.audit.lint_plan) and print one line per query.

Usage:
    python tools/lint_registry.py [sf_dir]        # default /root/testdata/sf0.001
    python tools/lint_registry.py --errors-only   # exit 1 if any error finding

The same check runs in CI form as tests/test_plans.py::test_registry_lints_error_free.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    errors_only = "--errors-only" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from parqueryd_spark import get_spark
    from parqueryd_spark.plans.audit import lint_plan
    from parqueryd_spark.queries import REGISTRY

    spark = get_spark("lint-registry")
    spark.sparkContext.setLogLevel("ERROR")
    n_err = 0
    for name, q in REGISTRY.items():
        try:
            finds = lint_plan(q.fn(spark, sf_dir))
        except Exception as e:  # a query that cannot even plan is itself a finding
            finds = [{"rule": "plan-failure", "severity": "error", "detail": str(e)[:120]}]
        errs = [f for f in finds if f["severity"] == "error"]
        n_err += len(errs)
        shown = errs if errors_only else finds
        if not shown:
            if not errors_only:
                print(f"{name:36s} clean")
            continue
        for f in shown:
            print(f"{name:36s} {f['severity'].upper():5s} {f['rule']}: {f['detail']}")
    spark.stop()
    return 1 if (errors_only and n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
