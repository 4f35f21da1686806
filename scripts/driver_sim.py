#!/usr/bin/env python
"""Simulate the grading driver: vanilla SparkSession (no engine configs,
non-UTC timezone), run every __spark_entry__ query at sf0.01 and compare
against its DuckDB oracle with the same order-insensitive exact check the
driver uses. Usage: python scripts/driver_sim.py [sf_dir]"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import duckdb
from pyspark.sql import SparkSession

from compare import assert_frames_match  # tests/compare.py

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # DRIVER_SIM_MASTER=local-cluster[2,8,4096] runs the same sweep with
    # SEPARATE executor JVMs (standalone workers): flushes assumptions a
    # single-JVM local[N] hides — closure/serialization, task-side file
    # paths, and broadcast/accumulator transport (VERDICT r12 item 1).
    master = os.environ.get("DRIVER_SIM_MASTER", "local[16]")
    builder = (
        SparkSession.builder.master(master)
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local-cluster"):
        # pip-installed pyspark: workers need SPARK_HOME + the jars dir
        import pyspark

        os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
        # default executor memory = the master string's worker-memory
        # field (local-cluster[n,cores,MEM_MB]) — a fixed default above
        # the worker's capacity would make the standalone master reject
        # every executor and the app hang waiting for resources
        worker_mb = master.rstrip("]").split(",")[-1].strip()
        builder = builder.config(
            "spark.executor.memory",
            os.environ.get("DRIVER_SIM_EXEC_MEM", f"{worker_mb}m"),
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    df = e.entry(spark)
    print(f"entry: {len(df.collect())} rows")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            pdf = fn(spark, sf_dir).toPandas()
            if name in osql:
                assert_frames_match(pdf, con.execute(osql[name]).df(), name)
                status = f"oracle-match {len(pdf)} rows"
            else:
                status = f"rows-only {len(pdf)} rows"
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            status = f"FAIL {type(ex).__name__}: {str(ex)[:300]}"
        print(f"{name:32s} {time.perf_counter() - t0:6.2f}s {status}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
