#!/usr/bin/env python
"""Check a handful of gates against their DuckDB oracles without paying
for a full driver_sim sweep — the per-gate loop used while developing.

Usage: python scripts/check_gates.py [sf_dir] name [name ...]
(sf_dir defaults to /root/testdata/sf0.01; pass an absolute path first
to override, e.g. /root/testdata/sf0.1.)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import duckdb
from pyspark.sql import SparkSession

from compare import assert_frames_match

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def main() -> int:
    names = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if names and names[0].startswith("/"):
        sf = names.pop(0)
    if not names:
        print(__doc__)
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    from csv2db_spark.registry import load_all_queries

    qs = load_all_queries()
    fail = 0
    for n in names:
        q = qs[n]
        t0 = time.perf_counter()
        try:
            pdf = q.fn(spark, sf).toPandas()
            if q.oracle:
                assert_frames_match(pdf, con.execute(q.oracle).df(), n)
                print(f"{n}: MATCH {len(pdf)} rows {time.perf_counter() - t0:.1f}s")
            else:
                print(f"{n}: rows-only {len(pdf)} rows {time.perf_counter() - t0:.1f}s")
        except Exception as ex:  # noqa: BLE001
            fail += 1
            print(f"{n}: FAIL {type(ex).__name__}: {str(ex)[:400]}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
