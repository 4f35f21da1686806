"""SparkSession factory.

One place for the engine's Spark configuration so tests, bench.py and the
driver entrypoint all run the same way. The settings are chosen for a real
multi-executor cluster (AQE re-planning, skew-join handling, partition
coalescing) and merely *tested* on local[N]:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting means
  the static ``spark.sql.shuffle.partitions`` is only an upper bound; at
  100 TB you raise it (or leave AQE to coalesce) without code changes.
- Session timezone pinned to UTC so timestamp semantics are independent of
  the host machine (the fixtures store naive timestamps).
- Arrow enabled for every pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "csv2db-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    return builder.getOrCreate()


def cluster_submit_conf(
    executors: int = 1000,
    executor_cores: int = 8,
    executor_mem: str = "32g",
) -> dict[str, str]:
    """Reference spark-submit configuration for running this engine on a
    real cluster at the ~100 TB scale it is designed for. Not used by the
    local test harness — documents (and pins in one reviewable place) how
    the local settings generalize.

    Sizing rules encoded here:
    - shuffle partitions ~ 2-3x total cores so AQE coalesces down rather
      than tasks queueing up; skew-join splitting stays on.
    - executor memory sized so a shuffle partition of
      ``maxPartitionBytes`` (+ decimal/codegen overhead) fits with room
      for 2 concurrent tasks per core of margin.
    - RocksDB state store for streaming: state no longer bounded by heap.
    - dynamic allocation for mixed workloads; Kryo for the shuffle wire.
    """
    total_cores = executors * executor_cores
    return {
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(executor_cores),
        "spark.executor.memory": executor_mem,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": "64MB",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(executors),
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }
