"""Tracer — per-op diff samples, mirroring /root/reference/data_juicer/
core/tracer.py:10-236 (mapper text pairs :37-77, filter dropped rows
:127-182, dedup pairs :184-236), as cheap DataFrame diffs:

- mapper: join input/output on a key, keep rows where text changed;
- filter: anti-join input vs output (dropped rows);
- dedup: the duplicate pairs (kept vs removed) per cluster.

Each trace is `limit(show_num)` — bounded driver data regardless of
input size — and written as jsonl next to the work dir.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Tracer:
    def __init__(self, work_dir: str, show_num: int = 10):
        self.work_dir = work_dir
        self.show_num = show_num
        os.makedirs(work_dir, exist_ok=True)

    def _dump(self, op_name: str, df: DataFrame) -> str:
        path = os.path.join(self.work_dir, f"trace-{op_name}.jsonl")
        rows = df.limit(self.show_num).toJSON().collect()
        with open(path, "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))
        return path

    def trace_mapper(self, op_name: str, before: DataFrame, after: DataFrame,
                     key: str, text_key: str = "text") -> str:
        """Sample of (original_text, processed_text) pairs that changed."""
        b = before.select(F.col(key), F.col(text_key).alias("original_text"))
        a = after.select(F.col(key), F.col(text_key).alias("processed_text"))
        diff = (
            b.join(a, on=key)
            .where(F.col("original_text") != F.col("processed_text"))
        )
        return self._dump(op_name, diff)

    def trace_filter(self, op_name: str, before: DataFrame, after: DataFrame,
                     key: str) -> str:
        """Sample of rows the filter dropped."""
        dropped = before.join(after.select(key), on=key, how="left_anti")
        return self._dump(op_name, dropped)

    def trace_deduplicator(self, op_name: str, before: DataFrame,
                           after: DataFrame, key: str,
                           text_key: str = "text") -> str:
        """Sample of removed duplicates (dup1 = removed row's text)."""
        removed = before.join(after.select(key), on=key, how="left_anti")
        return self._dump(op_name, removed.select(key, text_key))
