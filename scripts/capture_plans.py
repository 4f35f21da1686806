#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the
bench headline + extended set). The engine session is used (same confs
as bench.py) so the captured initial plan matches what the bench runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


BENCH_EXTENDED = (
    "q01_pricing_summary",
    "q_agg_groupby_multi",
    "q_dedup_minhash_lsh",
    "q_join_inner_topk",
    "q_join_multiway_revenue",
    "q_sim_cosine_topk",
    "q_window_rank_topn",
    "q_tpch_q18_large_volume",
    "q_text_bm25_topk",
    "q_pipeline_curation_v2",
    "q_text_bigram_lm",
    "q_embed_covariance",
    "q_dedup_minhash_lsh_xxh",
    "q_dedup_span_trim",
    "q_dedup_containment",
    "q_pipeline_curation_v6",
    "q_graph_triangles",
)


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(BENCH_EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from csv2db_spark import get_spark
    from csv2db_spark.registry import load_all_queries

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all_queries()
    for name in names:
        df = queries[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
