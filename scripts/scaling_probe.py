#!/usr/bin/env python
"""Empirical scaling probe: time a set of representative queries at every
available fixture scale (sf0.001 / sf0.01 / sf0.1 — a 100x span of input
size) in ONE warm session and fit the per-query scaling exponent
    t(sf) ~ sf^beta
by least squares on log-log points.

This is the measured answer to "would this plan survive 100x the data":
beta <= ~1 means the operator's cost is at-most-linear in input size over
two decades (constant-dominated queries show beta near 0 at these sizes);
beta >> 1 means super-linear work (a pairwise blowup, a driver-side sink,
a skew hotspot) that WILL fall over at cluster scale. The probe exists to
catch the latter class mechanically instead of by plan-reading alone —
results and adjudication are recorded in PLANS.md ("Round-6 scaling
probe").

Protocol notes: every (query, sf) is run untimed once (plan-shape codegen
warmup at that exact scale — AQE replans per input size, see the bench
warmup fix) and then timed best-of-2, so the numbers are steady-state
execution, not JIT compile. Timings to the noop sink — the full
distributed plan with zero driver collection.

Usage: python scripts/scaling_probe.py [query ...]
Prints one JSON line: {"sfs": [...], "queries": {name: {"times": {...},
"beta": b}}}.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIRS = {
    0.001: "/root/testdata/sf0.001",
    0.01: "/root/testdata/sf0.01",
    0.1: "/root/testdata/sf0.1",
}

# Headline set + the heaviest LLM/analytics shapes: the queries whose
# scaling behavior carries the 100 TB argument.
DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q_agg_groupby_multi",
    "q_dedup_minhash_lsh",
    "q_dedup_minhash_lsh_xxh",
    "q_join_inner_topk",
    "q_join_multiway_revenue",
    "q_sim_cosine_topk",
    "q_window_rank_topn",
    "q_tpch_q18_large_volume",
    "q_text_bm25_topk",
    "q_text_bigram_lm",
    "q_embed_covariance",
    "q_pipeline_curation_v2",
    "q_curate_decontaminate",
    "q_dedup_embedding_cosine",
    "q_events_sessionize",
    # round-7 additions: the heavies that entered in round 6 (VERDICT
    # next-round #7) — track their 100x-span growth like the headline set
    "q_dedup_containment",
    "q_dedup_span_trim",
    "q_pipeline_curation_v6",
    "q_pipeline_curation_v7",
    "q_sink_snapshot_merge",
    "q_stream_minhash_dedup",
    # round-8 additions: the round-7 gates (r7 VERDICT next-round #5) —
    # corpus-scan decontamination, the v8 composition, and the windowed
    # TWAP join the standing 100x-span tracking
    "q_curate_decontaminate_semantic",
    "q_pipeline_curation_v8",
    "q_ts_time_weighted_avg",
    # round-8 session 3: the rewritten heavies (bitmap triangles, the
    # arrays_zip window-fingerprint span family) join the tracking set
    "q_graph_triangles",
    "q_dedup_span_removal",
    "q_pipeline_curation_v5",
    # round 9: the rank/sample family that grew cutpoint scale modes —
    # tracked in their gate-default window mode so a regression in
    # EITHER the default plan or the shared grouped_* machinery shows
    # up as a beta jump
    "q_text_ccnet_buckets",
    "q_curate_quantile_filter",
    "q_curate_token_budget",
    "q_curate_stratified_sample",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES

    from csv2db_spark import get_spark
    from csv2db_spark.registry import load_all_queries

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all_queries()

    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 1

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name].fn
        times: dict[float, float] = {}
        for sf, d in sorted(SF_DIRS.items()):
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[sf] = round(best, 3)
        # least-squares slope of log t on log sf
        xs = [math.log10(sf) for sf in times]
        ys = [math.log10(max(t, 1e-3)) for t in times.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        # fixed overhead dominates sub-second queries at these sizes and
        # dilutes the fit, so also report the LAST-decade growth (10x data
        # from sf0.01 to sf0.1): ratio <= 10 is at-most-linear where the
        # data cost is largest relative to constants.
        sfs = sorted(times)
        ratio = times[sfs[-1]] / max(times[sfs[-2]], 1e-3)
        out[name] = {
            "times": {str(sf): t for sf, t in times.items()},
            "beta": round(beta, 3),
            "last_decade_ratio": round(ratio, 2),
        }
        print(
            f"{name:32s} {out[name]['times']}  beta={out[name]['beta']}"
            f"  x{out[name]['last_decade_ratio']}/decade",
            file=sys.stderr,
        )

    print(json.dumps({"sfs": sorted(SF_DIRS), "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
