#!/usr/bin/env python
"""Executor-loss resilience check for the materialize_stage knob —
the multi-JVM follow-on to the local-cluster registry sweep (VERDICT
r12 item 1). Runs under local-cluster (separate executor JVMs), stages
a DataFrame through operators/stage.materialize_stage in BOTH modes,
kills one executor JVM with SIGKILL, then re-consumes the staged frame:

- mode='reliable' (durable parquet staging) must return identical rows
  — the staging survives any executor loss by construction;
- mode='local' (eager localCheckpoint) stores blocks in executor
  storage with TRUNCATED lineage, so losing the executor that holds a
  block is unrecoverable-by-design; Spark surfaces a checkpoint-block
  error (or succeeds if every block happened to live on the survivor).
  Either outcome is consistent with the documented contract
  (queries/curation.py curation_v6_pipeline docstring); what would be
  a BUG is 'local' returning WRONG rows, which this script asserts
  against.

Usage: python scripts/chaos_check.py [sf_dir]
Prints one line per mode; exit 0 iff 'reliable' survived with equal
rows and 'local' either failed loudly or returned equal rows.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def executor_pids(app_id: str) -> set[int]:
    """Pids of THIS app's executor JVMs only — the executor command
    line carries --app-id, and matching on it keeps a concurrent
    local-cluster session's executors (e.g. a driver_sim sweep on the
    same host) out of the kill set."""
    out = subprocess.run(
        ["pgrep", "-af", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    )
    return {
        int(line.split(None, 1)[0])
        for line in out.stdout.splitlines()
        if app_id in line
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("chaos-check")
        .config("spark.executor.memory", "2048m")
        .config("spark.ui.enabled", "false")
        # keep task retries on: surviving-executor recompute is the
        # behavior under test, not something to disable
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from csv2db_spark.operators.stage import materialize_stage
    from csv2db_spark.sources import load_table

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", F.length("text").alias("n_chars"))
        .repartition(8, "doc_id")  # blocks spread across BOTH executors
    )
    expect = sorted(tuple(r) for r in base.collect())

    app_id = spark.sparkContext.applicationId
    failures = 0
    stage_dirs: list[str] = []
    for mode in ("reliable", "local"):
        if mode == "reliable":
            stage_dir = tempfile.mkdtemp(prefix="chaos_reliable_")
            stage_dirs.append(stage_dir)
        else:
            stage_dir = None
        staged = materialize_stage(base, mode=mode, path=stage_dir)
        n0 = staged.count()
        before = executor_pids(app_id)
        assert len(before) >= 2, (
            f"need >= 2 executor JVMs to spread blocks, found {len(before)}"
        )
        victim = sorted(before)[0]
        try:
            os.kill(victim, signal.SIGKILL)
        except ProcessLookupError:
            pass  # raced with its own exit; the loss already happened
        # wait for the worker to notice AND relaunch a replacement, so
        # the next iteration stages its blocks across a full cluster
        # again (victim-gone alone fires while only the survivor runs)
        deadline = time.time() + 60
        while time.time() < deadline:
            now = executor_pids(app_id)
            if victim not in now and len(now) >= len(before):
                break
            time.sleep(1)
        time.sleep(3)  # let the replacement register with the driver
        try:
            got = sorted(tuple(r) for r in staged.collect())
            if got == expect and len(got) == n0:
                print(f"{mode}: survived executor SIGKILL, rows identical "
                      f"({n0} rows)")
            else:
                print(f"{mode}: WRONG ROWS after executor loss "
                      f"({len(got)} vs {n0}) — BUG")
                failures += 1
        except Exception as ex:  # noqa: BLE001
            msg = str(ex).splitlines()[0][:160]
            if mode == "local":
                print(f"local: failed loudly after executor loss (the "
                      f"documented contract): {type(ex).__name__}: {msg}")
            else:
                print(f"reliable: MUST survive executor loss but raised "
                      f"{type(ex).__name__}: {msg} — BUG")
                failures += 1
    spark.stop()
    import shutil

    for d in stage_dirs:  # standing per-round check: don't litter /tmp
        shutil.rmtree(d, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
