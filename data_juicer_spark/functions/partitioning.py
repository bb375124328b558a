"""Input-parallelism guard for per-row compute stages.

A parquet file with a single row group (or any tiny input) produces ONE
scan task no matter how many cores the cluster has — Spark's byte-range
splitting cannot split inside a row group — so every per-row stage
chained on the scan (regex mapper chains, signature pandas UDFs, score
expressions) runs serially. That is the classic "unsplittable input"
skew from the optimization playbook: fix it by repartitioning right
after the read.

The guard is deliberately conservative so it is a no-op at scale:
- only fires when the optimizer's OWN size estimate for the whole plan
  is at most one scan split (spark.sql.files.maxPartitionBytes) — the
  fan-out shuffle therefore moves at most one split of bytes, and a
  100 TB input (which dwarfs one split) is never touched;
- never fires when the plan already contains an Exchange — shuffled
  inputs are already spread over shuffle partitions;
- any introspection failure falls back to leaving the plan alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEFAULT_MAX_SPLIT = 128 * 1024 * 1024


def _max_split_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes",
                         str(_DEFAULT_MAX_SPLIT))
    units = {"k": 1024, "m": 1024 ** 2, "g": 1024 ** 3, "b": 1}
    raw = raw.strip().lower()
    try:
        if raw and raw[-1] in units:
            return int(float(raw[:-1]) * units[raw[-1]])
        return int(raw)
    except ValueError:
        return _DEFAULT_MAX_SPLIT


def ensure_scan_parallelism(df: DataFrame) -> DataFrame:
    """Fan a small, scan-only input out to defaultParallelism partitions.

    Cost bound: fires only when the optimizer estimates the entire input
    below one scan split, so the added round-robin exchange moves at
    most maxPartitionBytes. Everything this engine applies it to is
    row-order independent (pure per-row stats/signatures, keep-min-id
    dedup, deterministic top-k ties), so results are unchanged.
    """
    spark = df.sparkSession
    try:
        qe = df._jdf.queryExecution()
        size = int(str(qe.optimizedPlan().stats().sizeInBytes()))
        if size > _max_split_bytes(spark):
            return df
        if "Exchange" in qe.sparkPlan().toString():
            return df
    except Exception:
        return df
    par = spark.sparkContext.defaultParallelism
    return df.repartition(par)
