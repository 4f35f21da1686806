#!/usr/bin/env python
"""Headline-query benchmark (driver contract).

Runs every registry query flagged ``bench=True`` at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line. Queries execute via the noop sink so the full distributed plan
runs without driver-side collection costs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from csv2db_spark import get_spark
    from csv2db_spark.registry import load_all_queries

    spark = get_spark("csv2db-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in load_all_queries().items() if q.bench}

    # Untimed warmup at the smallest SF: JIT/codegen compilation, parquet
    # footer + filesystem caches, broadcast machinery. Measured numbers then
    # reflect steady-state executor throughput, which is what a long-running
    # cluster actually delivers.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name, qd in sorted(bench_queries.items()):
            try:
                qd.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    times: dict[str, float] = {}
    for name, qd in sorted(bench_queries.items()):
        t0 = time.perf_counter()
        qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
