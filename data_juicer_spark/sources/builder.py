"""DatasetBuilder + Exporter — the reference's load/export surface
re-expressed on spark.read / df.write.

DatasetBuilder (/root/reference/data_juicer/core/data/dataset_builder.py
:18-159): config list of {path, format?, weight?} → per-source load →
weighted mixture via seeded sample() → unionByName. Supported formats
mirror the reference's formatter registry + Ray datasource list
(format/*.py; ray_dataset.py:258-292): json/jsonl, parquet, csv, tsv,
text, binary (binaryFile). `max_sample_num` applies a seeded limit.

Exporter (core/exporter.py:264-348): json/jsonl/csv/parquet writers
with shard-count control (repartition) — shard_size becomes a target
row count per file rather than bytes (deterministic, distributed).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMAT_BY_EXT = {
    "jsonl": "json", "json": "json", "parquet": "parquet", "csv": "csv",
    "tsv": "tsv", "txt": "text", "text": "text", "md": "text",
    "bin": "binaryFile", "png": "binaryFile", "jpg": "binaryFile",
    "wav": "binaryFile", "mp4": "binaryFile", "tfrecord": "tfrecord",
}


class DatasetBuilder:
    def __init__(self, spark: SparkSession, seed: int = 42):
        self.spark = spark
        self.seed = seed

    def _load_one(self, path: str, fmt: Optional[str] = None,
                  length: int = 0) -> DataFrame:
        if fmt == "empty":
            # EmptyFormatter mirror (format/empty_formatter.py): N rows
            # with a null text payload, to be filled by generator ops
            return self.spark.range(length).select(
                F.col("id").alias("sample_id"),
                F.lit(None).cast("string").alias("text"))
        fmt = fmt or _FORMAT_BY_EXT.get(path.rsplit(".", 1)[-1].lower(), "parquet")
        reader = self.spark.read
        if fmt == "json":
            return reader.json(path)
        if fmt == "parquet":
            return reader.parquet(path)
        if fmt == "csv":
            return reader.option("header", "true").option("inferSchema", "true").csv(path)
        if fmt == "tsv":
            return (reader.option("header", "true").option("sep", "\t")
                    .option("inferSchema", "true").csv(path))
        if fmt == "text":
            return reader.text(path).withColumnRenamed("value", "text")
        if fmt == "binaryFile":
            return reader.format("binaryFile").load(path)
        if fmt == "tfrecord":
            from data_juicer_spark.sources.tfrecord import read_tfrecord
            return read_tfrecord(self.spark, path)
        raise ValueError(f"unsupported format {fmt!r}")

    def load(self, configs: List[dict] | List[str],
             max_sample_num: Optional[int] = None) -> DataFrame:
        """configs: [{'path': ..., 'format': ..., 'weight': ...}, ...] or
        plain path strings. weight w<1 samples a fraction; w>1 is a
        relative duplication factor (mixture semantics,
        dataset_builder.py:138-140)."""
        dfs = []
        for cfg in configs:
            if isinstance(cfg, str):
                cfg = {"path": cfg}
            df = self._load_one(cfg.get("path", ""), cfg.get("format"),
                                length=int(cfg.get("length", 0)))
            w = float(cfg.get("weight", 1.0))
            if w < 1.0:
                df = df.sample(fraction=w, seed=self.seed)
            elif w > 1.0:
                whole, frac = int(w), w - int(w)
                parts = [df] * whole
                if frac > 0:
                    parts.append(df.sample(fraction=frac, seed=self.seed))
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
                df = out
            dfs.append(df)
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        if max_sample_num:
            out = out.limit(max_sample_num)
        return out

    @staticmethod
    def parse_cli_datapath(datapath: str) -> List[dict]:
        """'w1 ds1.jsonl w2 ds2_dir ds3' → configs
        (dataset_builder.py:162-224 CLI grammar: optional weight before
        each path)."""
        tokens = datapath.split()
        out: List[dict] = []
        pending_w: Optional[float] = None
        for tok in tokens:
            try:
                pending_w = float(tok)
                continue
            except ValueError:
                pass
            out.append({"path": tok, "weight": pending_w or 1.0})
            pending_w = None
        return out


class Exporter:
    @staticmethod
    def export(df: DataFrame, path: str, fmt: str = "parquet",
               num_shards: Optional[int] = None, mode: str = "overwrite",
               wds_columns: Optional[dict] = None, key_col: str = "sample_key"):
        if fmt == "webdataset":
            import os as _os
            import shutil as _shutil

            from data_juicer_spark.sources.webdataset import write_webdataset

            if not wds_columns:
                raise ValueError("webdataset export needs wds_columns="
                                 "{ext: 'string'|'binary'}")
            if _os.path.isdir(path):
                if mode == "overwrite":
                    _shutil.rmtree(path)  # stale shards must not survive
                elif mode != "append":
                    raise ValueError(
                        f"webdataset target {path!r} exists (mode={mode!r})")
            write_webdataset(df, path, wds_columns, key_col=key_col,
                             num_shards=num_shards)
            return
        if fmt == "tfrecord":
            import os as _os
            import shutil as _shutil

            from data_juicer_spark.sources.tfrecord import write_tfrecord

            if _os.path.isdir(path):
                if mode == "overwrite":
                    _shutil.rmtree(path)
                elif mode != "append":
                    raise ValueError(
                        f"tfrecord target {path!r} exists (mode={mode!r})")
            write_tfrecord(df, path, num_shards=num_shards)
            return
        if num_shards:
            df = df.repartition(num_shards)
        writer = df.write.mode(mode)
        if fmt in ("json", "jsonl"):
            writer.json(path)
        elif fmt == "parquet":
            writer.parquet(path)
        elif fmt == "csv":
            writer.option("header", "true").csv(path)
        elif fmt == "tsv":
            writer.option("header", "true").option("sep", "\t").csv(path)
        else:
            raise ValueError(f"unsupported export format {fmt!r}")

    @staticmethod
    def export_stats(df: DataFrame, path: str, key_cols: List[str]):
        """Per-op stats side-export (base_op.py:531-532 mirror)."""
        cols = [c for c in key_cols if c in df.columns]
        if "stats" in df.columns:
            cols.append("stats")
        df.select(*cols).write.mode("overwrite").json(path)
