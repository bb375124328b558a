"""Groupers + Aggregators.

Groupers batch rows into one row of lists (reference:
/root/reference/data_juicer/ops/grouper/*); Aggregators summarize a
batched group (reference aggregators are LLM-API calls — out of scope;
we ship a deterministic applyInPandas-shaped aggregator instead)."""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_juicer_spark.operators.base import Aggregator, Grouper
from data_juicer_spark.registry import OPERATORS


@OPERATORS.register("naive_grouper")
class NaiveGrouper(Grouper):
    """whole dataset → one batched row of lists (naive_grouper.py:22-28).
    Lists are sorted by id_key so the batched row is deterministic.

    Faithful to the reference's semantics, which are inherently
    driver-bound (ONE row holding every value) — so `max_rows` guards
    the collapse: the plan raises (JVM-side, during the same agg job —
    no extra action) instead of silently assembling the row. The guard
    is best-effort: it is a result expression, so it fires after the
    final task has merged its collect_list buffers — it fails fast for
    moderate overruns but cannot pre-empt an OOM that happens during
    the merge itself. At scale, group with key_value_grouper (bounded
    groups) instead; this op exists for reference-recipe parity."""

    def __init__(self, id_key: Optional[str] = None,
                 max_rows: Optional[int] = 1_000_000, **kw):
        super().__init__(**kw)
        self.id_key = id_key
        self.max_rows = max_rows

    def apply(self, df: DataFrame) -> DataFrame:
        order = self.id_key or df.columns[0]

        def lst(c):
            out = F.sort_array(F.collect_list(
                F.struct(F.col(order).alias("_o"), F.col(c).alias("_v"))
            ))["_v"]
            return out

        aggs = [lst(c).alias(c) for c in df.columns]
        if self.max_rows is not None:
            guard = F.count(F.lit(1)) <= F.lit(self.max_rows)
            aggs[0] = (
                F.when(guard, lst(df.columns[0]))
                .otherwise(F.raise_error(F.lit(
                    f"naive_grouper would batch more than "
                    f"{self.max_rows} rows into one driver-bound row; "
                    f"raise max_rows (or pass max_rows=None) if this "
                    f"is intentional")))
                .alias(df.columns[0])
            )
        return df.agg(*aggs)


@OPERATORS.register("key_value_grouper")
class KeyValueGrouper(Grouper):
    """group rows by key columns into batched rows (key_value_grouper.py:19-51)."""

    def __init__(self, group_by_keys: Optional[List[str]] = None,
                 id_key: Optional[str] = None, **kw):
        super().__init__(**kw)
        # reference default: group by the text column itself when no
        # keys are given (key_value_grouper.py:30)
        self.keys = list(group_by_keys) if group_by_keys else [self.text_key]
        self.id_key = id_key

    def apply(self, df: DataFrame) -> DataFrame:
        order = self.id_key or df.columns[0]
        value_cols = [c for c in df.columns if c not in self.keys]
        aggs = [
            F.sort_array(F.collect_list(F.struct(F.col(order).alias("_o"), F.col(c).alias("_v"))))
            ["_v"].alias(c)
            for c in value_cols
        ]
        return df.groupBy(*self.keys).agg(*aggs)


@OPERATORS.register("naive_reverse_grouper")
class NaiveReverseGrouper(Grouper):
    """unbatch: batched row → rows (naive_reverse_grouper.py:24-53) via
    explode(arrays_zip). `batch_meta_export_path` mirrors the
    reference's :36-51 contract: per-batch metadata (a `batch_meta`
    column) is written out as JSON lines and STRIPPED from the result —
    batch metas are one row per batched group, so the export is a
    small driver-side action by construction."""

    def __init__(self, list_cols: Optional[List[str]] = None,
                 batch_meta_export_path: Optional[str] = None,
                 batch_meta_key: str = "batch_meta", **kw):
        super().__init__(**kw)
        self.list_cols = list_cols
        self.batch_meta_export_path = batch_meta_export_path
        self.batch_meta_key = batch_meta_key

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import ArrayType

        if self.batch_meta_key in df.columns:
            if self.batch_meta_export_path is not None:
                import json
                import os

                # lazy localCheckpoint: the export collect below is the
                # first action, so it materializes the (one-row-per-
                # group) batched frame ONCE and the unbatched downstream
                # reuses those partitions instead of recomputing the
                # upstream plan a second time
                df = df.localCheckpoint(eager=False)
                metas = [r[0] for r in
                         df.select(self.batch_meta_key).collect()]
                d = os.path.dirname(self.batch_meta_export_path)
                if d:
                    os.makedirs(d, exist_ok=True)
                with open(self.batch_meta_export_path, "w") as fh:
                    for m in metas:
                        m = m.asDict(recursive=True) if hasattr(
                            m, "asDict") else m
                        fh.write(json.dumps(m, ensure_ascii=False) + "\n")
            df = df.drop(self.batch_meta_key)  # dropped either way
        list_cols = self.list_cols or [
            f.name for f in df.schema.fields if isinstance(f.dataType, ArrayType)
        ]
        others = [c for c in df.columns if c not in list_cols]
        zipped = F.explode(F.arrays_zip(*[F.col(c) for c in list_cols])).alias("__z__")
        out = df.select(*others, zipped)
        return out.select(*others, *[F.col(f"__z__.{c}").alias(c) for c in list_cols])


@OPERATORS.register("group_stats_aggregator")
class GroupStatsAggregator(Aggregator):
    """NEW deterministic aggregator (the reference's aggregators are
    LLM-API summarizers, nested_aggregator.py:19-182 — out of scope):
    per-group numeric summary of a column (count/avg/min/max/stddev),
    the applyInPandas-shaped contract with a pure-Catalyst fast path."""

    def __init__(self, group_keys: List[str] = (), value_col: str = "", **kw):
        super().__init__(**kw)
        self.keys = list(group_keys)
        self.value_col = value_col

    def apply(self, df: DataFrame) -> DataFrame:
        v = F.col(self.value_col)
        return df.groupBy(*self.keys).agg(
            F.count(v).alias("cnt"),
            F.round(F.avg(v), 6).alias("avg_val"),
            F.min(v).alias("min_val"),
            F.max(v).alias("max_val"),
            F.round(F.stddev_samp(v), 6).alias("std_val"),
        )
