#!/usr/bin/env python
"""Bench-extended-protocol timer for named queries: warmup at sf0.001
then at the target SF, then N timed noop runs each. Prints one JSON
line. Compare like with like (same harness both sides of an A/B).

Usage: [TREE=label] python scripts/time_queries.py q_a q_b [--reps N]
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


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tree = os.environ.get("TREE", "head")

    from csv2db_spark import get_spark
    from csv2db_spark.registry import load_all_queries

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in args:
        qd = queries[name]
        for wd in ("/root/testdata/sf0.001", sf_dir):
            noop(qd.fn(spark, wd))
        s0 = steal()
        series = []
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(qd.fn(spark, sf_dir))
            series.append(round(time.perf_counter() - t0, 3))
        out[name] = {"series": series, "best": min(series),
                     "steal": steal() - s0}
    print(json.dumps({"tree": tree, **out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
