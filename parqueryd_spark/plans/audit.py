"""Physical-plan audit helpers — the 100 TB design gate.

The reference has no plan representation at all (SURVEY.md §4); in this engine
the plan IS the product, so every operator's physical plan is asserted in
tests/test_plans.py: filters must reach the parquet scan (PushedFilters),
projections must prune the scan (ReadSchema), dimension joins must broadcast,
top-k must compile to TakeOrderedAndProject, and hot expressions must sit
inside WholeStageCodegen spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain output as a string (PySpark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_report(df: DataFrame) -> dict[str, bool | int]:
    """Quick structural facts about the physical plan, for tests and tuning."""
    plan = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    return {
        "has_pushed_filters": "PushedFilters: []" not in plan and "PushedFilters" in plan,
        "reads_parquet": "Scan parquet" in plan,
        "has_broadcast_join": "BroadcastHashJoin" in simple,
        "has_sortmerge_join": "SortMergeJoin" in simple,
        "has_take_ordered": "TakeOrderedAndProject" in simple,
        "has_partial_agg": "partial_" in simple or "HashAggregate" in plan,
        # AQE's pre-execution plan carries no codegen ids; vectorized scan
        # (Batched: true) is the observable stand-in, and python_evals==0
        # guarantees the operator chain stays codegen-eligible JVM built-ins
        "batched_scan": "Batched: true" in plan,
        "exchanges": simple.count("Exchange"),
        "python_evals": simple.count("ArrowEvalPython") + simple.count("MapInPandas"),
    }
