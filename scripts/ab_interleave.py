#!/usr/bin/env python
"""Interleaved A/B timer: legs alternate OLD/NEW within ONE session so
host noise hits both shapes equally (OPTIMIZATION_r14.md protocol).

The OLD leg is produced by monkeypatching a named toggle; the NEW leg
is the tree as-is. Usage:

    python scripts/ab_interleave.py <toggle> q_a [q_b ...] [--reps N]

Toggles are registered in TOGGLES below: each entry is (apply_old,
undo_old) callables. Prints one JSON line per query with both series
and the steal delta per leg.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _toggle_preserve_partitioning():
    """OLD = materialize_stage ignores preserve_partitioning."""
    import csv2db_spark.operators.stage as stage

    orig = stage.materialize_stage

    def old(df, mode="local", path=None, preserve_partitioning=False):
        return orig(df, mode=mode, path=path, preserve_partitioning=False)

    def apply_old():
        stage.materialize_stage = old
        # consumers import the symbol inside the function body, so the
        # module attribute swap is sufficient
    def undo_old():
        stage.materialize_stage = orig

    return apply_old, undo_old


def _toggle_single_window_topk():
    """OLD = _topk_per_query ranks with one per-query window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import csv2db_spark.llm.similarity as sim

    orig = sim._topk_per_query

    def old(scored, k, order, shard_on="neighbor_id", n_shards=64,
            size_hint=None):
        w = Window.partitionBy("query_id").orderBy(*order)
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    def apply_old():
        sim._topk_per_query = old

    def undo_old():
        sim._topk_per_query = orig

    return apply_old, undo_old


def _toggle_staged_edges():
    """OLD = graph loops checkpoint the edge list unpartitioned (the
    pre-round-14 shape: a fresh edge shuffle in every round's join)."""
    import csv2db_spark.operators.graph as graph

    orig = graph._stage_edges_by_key

    def old(edges, key):
        return edges.localCheckpoint(eager=True)

    def apply_old():
        graph._stage_edges_by_key = old

    def undo_old():
        graph._stage_edges_by_key = orig

    return apply_old, undo_old


def _toggle_window_rank_modes():
    """OLD = the round-13 rank shapes: per-group window sorts in the
    curation samplers/quantiles (overrides both the r14 cutpoint
    defaults and the call sites that now pass cutpoint explicitly)."""
    import csv2db_spark.llm.curation as cur

    names = (
        "quantile_filter",
        "score_quantile_normalize",
        "stratified_sample",
        "domain_cap",
        "token_budget_sample",
    )
    origs = {n: getattr(cur, n) for n in names}

    def wrap(fn):
        def old(*args, **kwargs):
            kwargs["rank_mode"] = "window"
            kwargs.pop("rank_bucket", None)
            return fn(*args, **kwargs)

        return old

    def apply_old():
        for n, fn in origs.items():
            setattr(cur, n, wrap(fn))

    def undo_old():
        for n, fn in origs.items():
            setattr(cur, n, fn)

    return apply_old, undo_old


TOGGLES = {
    "preserve_partitioning": _toggle_preserve_partitioning,
    "single_window_topk": _toggle_single_window_topk,
    "staged_edges": _toggle_staged_edges,
    "window_rank_modes": _toggle_window_rank_modes,
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    toggle_name, names = args[0], args[1:]
    apply_old, undo_old = TOGGLES[toggle_name]()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from csv2db_spark import get_spark
    from csv2db_spark.registry import load_all_queries

    spark = get_spark("ab-interleave")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        qd = queries[name]
        for wd in ("/root/testdata/sf0.001", sf_dir):
            noop(qd.fn(spark, wd))
        res = {"old": {"series": [], "steal": 0},
               "new": {"series": [], "steal": 0}}
        for _ in range(reps):
            for leg in ("old", "new"):
                if leg == "old":
                    apply_old()
                try:
                    s0, t0 = steal(), time.perf_counter()
                    noop(qd.fn(spark, sf_dir))
                    res[leg]["series"].append(
                        round(time.perf_counter() - t0, 3))
                    res[leg]["steal"] += steal() - s0
                finally:
                    if leg == "old":
                        undo_old()
        for leg in res:
            res[leg]["best"] = min(res[leg]["series"])
        print(json.dumps({"query": name, "toggle": toggle_name, **res}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
