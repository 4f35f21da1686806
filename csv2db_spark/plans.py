"""Programmatic physical-plan audit — the greps of PLANS.md as a
library.

`tests/test_plan_shapes.py` pins individual queries' shapes; this gives
the same signals as data, for any DataFrame, so a pipeline author (or a
CI check over every registered query) can assert "no Python in the hot
path", "bounded exchanges", "the dim side broadcast" without parsing
plan strings by hand. Everything is derived from the EXECUTED plan
string — the post-AQE truth, not the logical intent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_stats(df: DataFrame) -> dict:
    """Shape summary of the physical plan:

    - ``exchanges``: shuffle count (each is a full materialization
      barrier — the first number to stare at for a 100x scale-up)
    - ``broadcasts`` / ``sort_merge_joins`` / ``nested_loop_joins``:
      join strategy mix; an unexpected SMJ where a dim should broadcast
      is the classic silent regression
    - ``python_nodes``: Arrow/Python evaluation operators — the slow
      path; 0 for anything claiming pure codegen
    - ``codegen_spans``: WholeStageCodegen regions (wider is better)
    - ``scans`` / ``pushed_filter_scans``: file sources, and how many
      of them carry at least one pushed predicate
    - ``cartesian``: CartesianProduct occurrences (almost always a bug)
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan \w+", plan)
    pushed = re.findall(r"PushedFilters: \[[^\]]", plan)
    return {
        "exchanges": plan.count("Exchange "),
        "broadcasts": plan.count("BroadcastExchange")
        + plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python_nodes": len(re.findall(r"(ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "scans": len(scans),
        "pushed_filter_scans": len(pushed),
    }


def assert_plan(df: DataFrame, **limits) -> dict:
    """Assert upper bounds on plan_stats keys (``exchanges=2,
    python_nodes=0``). Returns the stats on success; raises
    AssertionError naming the violated bound and the actual shape —
    drop it into any pipeline's tests to freeze its physical shape."""
    stats = plan_stats(df)
    for key, bound in limits.items():
        if key not in stats:
            raise KeyError(f"unknown plan stat {key!r}")
        if stats[key] > bound:
            raise AssertionError(
                f"plan exceeds {key} <= {bound}: {stats}"
            )
    return stats
