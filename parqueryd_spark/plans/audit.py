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


def broadcast_scan_tables(df: DataFrame) -> set[str]:
    """Basenames (sans .parquet) of every file scan that feeds a
    BroadcastExchange in the static physical plan.

    The 100 TB guard: a fact table (lineitem, orders, events) must never appear
    here — a size-estimate broadcast of a fact at small SF is the single worst
    plan regression a scale-up can expose, because the estimate grows with the
    data while the already-shipped plan shape does not."""
    import re

    plan = explain_str(df, "formatted")
    tree, details = plan.split("\n\n", 1) if "\n\n" in plan else (plan, "")
    # node id -> parquet basename, from the per-node detail sections
    scan_file: dict[str, str] = {}
    cur_id = None
    for line in details.splitlines():
        m = re.match(r"\((\d+)\) Scan parquet", line)
        if m:
            cur_id = m.group(1)
        elif cur_id and "Location:" in line:
            f = re.search(r"([\w.-]+)\.parquet", line)
            if f:
                scan_file[cur_id] = f.group(1)
            cur_id = None
    # walk the indented tree: scans whose nearest enclosing subtree root is a
    # BroadcastExchange (any strictly-shallower BroadcastExchange above them
    # with no shallower non-broadcast boundary needed: broadcast subtrees are
    # whole — every deeper node until indent returns is inside it)
    out: set[str] = set()
    bcast_stack: list[int] = []  # indents of open BroadcastExchange subtrees
    for line in tree.splitlines():
        m = re.match(r"^([\s:+-]*)(\*?\(?\d*\)?\s*)?(\w[\w ]*\w)\s*\((\d+)\)", line)
        if not m:
            continue
        indent = len(m.group(1))
        name, node_id = m.group(3), m.group(4)
        while bcast_stack and indent <= bcast_stack[-1]:
            bcast_stack.pop()
        if "BroadcastExchange" in name:
            bcast_stack.append(indent)
        elif "Scan parquet" in name and bcast_stack and node_id in scan_file:
            out.add(scan_file[node_id])
    return out


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
