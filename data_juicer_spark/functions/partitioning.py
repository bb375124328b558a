"""Input-parallelism guard for per-row compute stages.

A parquet file with a single row group (or any tiny input) produces ONE
scan task no matter how many cores the cluster has — Spark's byte-range
splitting cannot split inside a row group — so every per-row stage
chained on the scan (regex mapper chains, signature pandas UDFs, fused
filter predicates) runs serially. That is the classic "unsplittable
input" skew from the optimization playbook: fix it by repartitioning
right after the read.

A plain repartition is NOT enough for Catalyst-pure filter chains:
PushDownPredicates happily moves a deterministic Filter below a
round-robin Repartition (normally a win — fewer shuffled rows), which
re-serializes the expensive predicate onto the single scan task
(measured: the whole fused cleaning pipeline ran as one 2.1 s task
below the exchange; rand()-guard fences get constant-folded away in
Spark 4.1). `localCheckpoint(eager=False)` is the reliable barrier:
downstream operators see an RDD scan that nothing can be pushed into,
so the heavy per-row work runs on the fanned-out partitions. The
checkpoint belongs to the query's own lineage — each fresh plan
re-materializes it, so nothing is reused across runs.

The guard is deliberately conservative so it is a no-op at scale:
- only fires when the optimizer's OWN size estimate for the whole plan
  is at most one scan split (spark.sql.files.maxPartitionBytes) — the
  fan-out therefore moves/pins at most one split of bytes, and a
  100 TB input (which dwarfs one split) is never touched;
- only fires for file-backed scans ("FileScan" in the physical plan):
  in-memory test relations and derived inputs are left alone;
- never fires when the plan already contains an Exchange — shuffled
  inputs are already spread over shuffle partitions;
- any introspection failure falls back to leaving the plan alone.

Note localCheckpoint data is not fault-tolerant (a lost executor fails
the query instead of recomputing); bounded by the one-split size cap,
a retry re-runs the whole (small) query.
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
    """Fan a small, file-scan-only input out to defaultParallelism
    partitions behind a pushdown barrier (see module docstring).

    Everything this engine applies it to is row-order independent (pure
    per-row stats/signatures, keep-min-id dedup, deterministic top-k
    ties), so results are unchanged.
    """
    spark = df.sparkSession
    try:
        qe = df._jdf.queryExecution()
        size = int(str(qe.optimizedPlan().stats().sizeInBytes()))
        if size > _max_split_bytes(spark):
            return df
        plan = qe.sparkPlan().toString()
        if "Exchange" in plan or "FileScan" not in plan:
            return df
    except Exception:
        return df
    par = spark.sparkContext.defaultParallelism
    return df.repartition(par).localCheckpoint(eager=False)
