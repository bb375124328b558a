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
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: cores for local mode; None -> $SPARK_GRAFT_CPUS or all.
    master: override (e.g. 'local-cluster[4,8,8192]' for multi-executor
    scaling runs — separate executor JVMs, the sandbox stand-in for a
    real N-executor cluster). On a real cluster, master/cores come from
    spark-submit and this is ignored (an existing session is returned).
    """
    active = SparkSession.getActiveSession()
    if active is not None and parallelism is None and extra_conf is None:
        return active

    cores = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    # 2x cores smooths stragglers in the Arrow-UDF stages
    shuffle = shuffle_partitions or max(cores * 2, 16)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        # bytes-based partition coalescing is WRONG for this workload:
        # text compresses ~5x in shuffle, so AQE sees "small" partitions
        # and squeezes the CPU-heavy pandas-UDF stages onto a handful of
        # tasks (measured: 4.6s stage on 8 tasks of a 32-core cluster).
        # Skew-join splitting stays on — that one is shape-based.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # List up to 512 path roots on the driver instead of launching
        # parallel-listing JOBS (default threshold 32): the MOR lake's
        # bucket-pruned reads pass O(num_buckets) dirs per delta, and
        # the per-job scheduling overhead dominated delta resolution at
        # small scale (measured 5.8s -> 0.9s on the sf0.1 fold). Above
        # 512 roots (genuinely large tables / object stores) Spark's
        # distributed listing takes over again.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "512")
        # v2 committer: task-side renames, no serial driver commit loop
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
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
    if master and master.startswith("local-cluster"):
        ship_package(spark)
    return spark


def build_pyfiles_zip(zip_path: str | None = None) -> str:
    """Package data_juicer_spark into the zip `spark-submit --py-files`
    expects (and ship_package addPyFile's). Driver-independent so launch
    tooling can build it before any session exists."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = zip_path or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "data_juicer_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for base, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(base, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return zip_path


def ship_package(spark: SparkSession) -> str:
    """Ship data_juicer_spark to executors — the `spark-submit
    --py-files dist.zip` equivalent, needed whenever executors are
    separate JVMs (local-cluster here, a real cluster in production)
    whose Python workers don't share the driver's sys.path."""
    zip_path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
