"""Distributed exact rank / prefix-sum primitives.

Spark has no built-in scalable *exact* global rank: ``Window.orderBy``
without partitionBy funnels every row through ONE task, and
``approxQuantile`` is approximate. The standard scalable recipe (what
``zipWithIndex`` does for RDDs) is: range-partition by the order key,
take per-partition totals (one tiny action, #partitions rows), then add
the partition offset to a partition-local prefix sum. This module
implements that for weighted values (value, weight) so consumers can
rank a full dataset by ranking only its DISTINCT values.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exclusive_prefix_sum(df: DataFrame, value_col: str, weight_col: str,
                         num_partitions: int | None = None,
                         out: str = "cum_before") -> Tuple[DataFrame, int]:
    """Exact exclusive prefix sum of ``weight_col`` in ``value_col`` order.

    Returns (frame with [value_col, weight_col, out], total_weight).
    ``out`` = sum of weights of all strictly-smaller values plus earlier
    rows of the same partition-local sort — callers pass DISTINCT values,
    so ties don't occur and ``out`` is exactly "count of rows below".

    Scale: ONE range-partition shuffle + one driver action of
    #partitions rows (the per-partition totals — bounded by the
    partition count, never by the data). No single-task global window.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = df.repartitionByRange(num_partitions, F.col(value_col)).persist()
    totals = (
        part.withColumn("__pid__", F.spark_partition_id())
        .groupBy("__pid__").agg(F.sum(weight_col).alias("__w__"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["__pid__"]):
        offsets[r["__pid__"]] = acc
        acc += int(r["__w__"] or 0)
    total = acc

    value_field = df.schema[value_col]
    weight_field = df.schema[weight_col]
    out_schema = (
        f"`{value_col}` {value_field.dataType.simpleString()}, "
        f"`{weight_col}` {weight_field.dataType.simpleString()}, "
        f"`{out}` long"
    )

    def local_cumsum(iterator):
        # one partition may arrive as SEVERAL Arrow batches — carry the
        # running sum across them (rows are pre-sorted within partition)
        run = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets.get(int(pdf["__pid__"].iloc[0]), 0)
            w = pdf[weight_col].astype("int64")
            pdf[out] = w.cumsum() - w + run
            run += int(w.sum())
            yield pdf[[value_col, weight_col, out]]

    # spark_partition_id() is evaluated on the SAME persisted partitioning
    # the totals were collected from, so offsets line up deterministically;
    # the eager localCheckpoint materializes the (small: one row per
    # distinct value) result so the cache can be released immediately —
    # no per-invocation storage leak in long-lived sessions
    ranked = (
        part.sortWithinPartitions(value_col)
        .withColumn("__pid__", F.spark_partition_id())
        .mapInPandas(local_cumsum, schema=out_schema)
        .localCheckpoint(eager=True)
    )
    part.unpersist()
    return ranked, total
