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


# --- adaptive plan-shape selection (round 15, VERDICT r14 item 4) ---
#
# Several operators carry TWO bit-identical plan shapes: a gate-scale
# shape (one keyed window / single per-query sort) and a 100 TB shape
# (two-stage shard rank, histogram-offset cutpoint rank). Round 14
# defaulted the scale shapes unconditionally and paid their extra
# exchanges at fixture size (driver-measured: cosine −14%, curation v2
# −45% locally). The adaptive rule picks the shape from Catalyst's own
# size estimate of the operator's input: below the threshold the
# single-sort shape is strictly better (the whole input fits one task's
# sort comfortably); above it the sharded shape is the only one that
# scales. Both branches produce bit-identical rows, pinned by the
# modes-equal tests, so the choice is invisible to every oracle.

ADAPTIVE_SMALL_KEY = "spark.csv2db.adaptive.smallInputMaxBytes"
ADAPTIVE_SMALL_DEFAULT = 256 * 1024 * 1024


def est_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes. Driver-side
    planning only — no job runs. File sources report real file sizes
    scaled through projections/filters, and a localCheckpoint carries
    the stats of the plan it truncated (Spark 4.1). JOIN estimates are
    product-of-children OVERestimates (measured: a self-join of a
    0.6 MB projection estimates 56 GB), which the adaptive rule reads
    as NOT small — the scale-safe direction; callers wanting a faithful
    signal should pass the scan-level input, not a join subtree."""
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    # py4j maps the underlying java.math.BigInteger to a Python int;
    # older bridges hand back the BigInt object itself
    return size if isinstance(size, int) else int(size.toString())


def small_input(df: DataFrame) -> bool:
    """True when ``df``'s estimated size is under
    ``spark.csv2db.adaptive.smallInputMaxBytes`` (default 256 MiB) —
    the gate for picking single-sort plan shapes over sharded ones.
    The threshold is a session conf so a cluster deployment (or a test
    pinning the scale shape) can move it without code changes; the
    default keeps fixture-scale inputs on the fast local shape while
    anything within an order of magnitude of a real corpus takes the
    skew-safe shape."""
    conf = df.sparkSession.conf
    threshold = int(conf.get(ADAPTIVE_SMALL_KEY, str(ADAPTIVE_SMALL_DEFAULT)))
    return est_size_bytes(df) < threshold


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
