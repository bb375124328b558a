"""WebDataset tar-shard source/sink.

The reference reads webdataset via Ray datasources (core/data/
ray_dataset.py:258-292) and exports it via ray_exporter (core/
ray_exporter.py:16-27). Spark has no built-in webdataset format, but the
container format is plain tar: entries `<key>.<ext>` grouped by key form
one sample. So the reader is `binaryFile` scan → Arrow-batched
`mapInPandas` with stdlib `tarfile` — one task per shard, embarrassingly
parallel, no codec deps (media payloads stay opaque bytes, matching the
multimodal column convention in operators/multimodal.py).
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


def _col_name(ext: str) -> str:
    return ext.replace(".", "_")


def read_webdataset(spark: SparkSession, path: str,
                    columns: Dict[str, str],
                    key_col: str = "sample_key") -> DataFrame:
    """Read webdataset tar shards into one row per sample.

    columns: {extension: 'string'|'binary'} — which member extensions to
    surface and how to type them (e.g. {'txt': 'string', 'json':
    'string', 'jpg': 'binary'}). Missing members are null. `path` is any
    binaryFile glob (e.g. 'dir/*.tar').
    """
    for ext, typ in columns.items():
        if typ not in ("string", "binary"):
            raise ValueError(f"column type for {ext!r} must be string|binary")
    schema = ", ".join(
        [f"`{key_col}` string", "`shard` string"]
        + [f"`{_col_name(e)}` {t}" for e, t in columns.items()]
    )
    exts = dict(columns)

    def parse_shards(it):
        import pandas as pd

        col_order = [key_col, "shard"] + [_col_name(e) for e in exts]
        for pdf in it:
            rows = []
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    samples: dict = {}
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        base = os.path.basename(m.name)
                        key, _, ext = base.partition(".")
                        if ext not in exts:
                            continue
                        samples.setdefault(key, {})[ext] = tf.extractfile(m).read()
                for key in sorted(samples):
                    row = {key_col: key, "shard": shard_path}
                    for ext, typ in exts.items():
                        v = samples[key].get(ext)
                        if v is not None and typ == "string":
                            v = v.decode("utf-8")
                        row[_col_name(ext)] = v
                    rows.append(row)
            yield pd.DataFrame(rows, columns=col_order)

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(parse_shards, schema=schema)
    )


def write_webdataset(df: DataFrame, out_dir: str, columns: Dict[str, str],
                     key_col: str = "sample_key",
                     num_shards: Optional[int] = None) -> int:
    """Write rows as webdataset tar shards (one tar per partition,
    executor-local filesystem — shared-FS/object-store paths on a real
    cluster). Returns the number of samples written."""
    os.makedirs(out_dir, exist_ok=True)
    if num_shards:
        df = df.repartition(num_shards)
    exts = dict(columns)

    def write_partition(it):
        import pandas as pd

        n = 0
        shard = os.path.join(out_dir, f"shard-{uuid.uuid4().hex[:12]}.tar")
        tf = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if tf is None:
                tf = tarfile.open(shard, "w")
            for _, row in pdf.iterrows():
                if "." in str(row[key_col]):
                    # the webdataset member-name convention splits at the
                    # FIRST dot, so a dotted key would silently vanish or
                    # collide on read-back — fail fast instead
                    raise ValueError(
                        f"sample key {row[key_col]!r} contains '.', which "
                        f"the webdataset naming convention reserves for "
                        f"extensions")
                for ext in exts:
                    v = row[_col_name(ext)]
                    if v is None:
                        continue
                    data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                n += 1
        if tf is not None:
            tf.close()
        yield pd.DataFrame({"n": [n]})

    counts = df.select(
        key_col, *[_col_name(e) for e in exts]
    ).mapInPandas(write_partition, schema="n long").collect()
    return sum(r["n"] for r in counts)
