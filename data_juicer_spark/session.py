"""SparkSession factory tuned for the CDC/ingest workload.

Scale notes (100 TB / 1000-executor design intent, tested on local[N]):
- AQE on: runtime partition coalescing + skew-join splitting covers the
  band-hash and (repo,path) upsert shuffles, whose key skew is the main
  efficiency risk (reference analogue: dedup core-scaling 0.74-0.85,
  /root/reference/docs/Distributed.md:51-56).
- Arrow execution on: every pandas UDF crosses the JVM<->Python boundary
  as Arrow record batches (vectorized, no per-row pickling).
- shuffle.partitions scales with requested parallelism so the same job
  evidences N vs 4N core scaling on identical input.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_juicer_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: cores for local mode; None -> $SPARK_GRAFT_CPUS or all.
    On a real cluster, master/cores come from spark-submit and the
    local[] master here is ignored (an existing session is returned).
    """
    active = SparkSession.getActiveSession()
    if active is not None and parallelism is None and extra_conf is None:
        return active

    cores = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    shuffle = shuffle_partitions or max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
