"""download_file_mapper — distributed URL fetch into bytes / local files
(reference mapper/download_file_mapper.py:19-200, aiohttp-based).

Spark-first shape: the fetch loop runs INSIDE an Arrow-batched pandas
UDF, so the cluster's task parallelism is the outer concurrency and
`max_concurrent` bounds a per-task thread pool for I/O overlap — the
distributed analogue of the reference's asyncio semaphore. Failures are
isolated per row (status/error columns, DLQ-style), never task-fatal.

Hermetic note: this container has no network, so tests exercise local
paths and file:// URLs; http(s) goes through stdlib urllib with the
same timeout semantics the reference passes to aiohttp."""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType,
)

from data_juicer_spark.operators.base import Mapper
from data_juicer_spark.registry import OPERATORS

_RESULT = StructType([
    StructField("content", BinaryType(), True),
    StructField("path", StringType(), True),
    StructField("status", StringType(), True),
    StructField("error", StringType(), True),
])


def _is_remote(url: str) -> bool:
    return url.startswith(("http://", "https://", "ftp://"))


def _fetch_one(url: str, save_dir: Optional[str], want_bytes: bool,
               resume: bool, timeout: int):
    """Fetch one URL → (content, path, status, error). Never raises."""
    try:
        if url is None or url == "":
            return (None, None, "failed", "empty url")
        save_path = None
        if save_dir:
            # executor-side: the driver's makedirs doesn't exist on
            # remote workers under yarn/k8s
            os.makedirs(save_dir, exist_ok=True)
            # NOTE: save path is keyed on the URL basename, like the
            # reference — two URLs sharing a basename collide on the
            # same file (and resume returns whichever landed first)
            save_path = os.path.join(save_dir, os.path.basename(
                url.split("?")[0].rstrip("/")) or "download")
            if resume and os.path.exists(save_path):
                content = None
                if want_bytes:
                    with open(save_path, "rb") as f:
                        content = f.read()
                return (content, save_path, "success", None)
        if _is_remote(url) or url.startswith("file://"):
            from urllib.request import urlopen

            with urlopen(url, timeout=timeout) as resp:
                content = resp.read()
        else:  # plain local path
            with open(url, "rb") as f:
                content = f.read()
        if save_path:
            import threading
            import uuid

            # unique per writer: pid alone collides when two pool
            # threads in one task hit the same basename concurrently
            tmp = (f"{save_path}.part-{os.getpid()}-"
                   f"{threading.get_ident()}-{uuid.uuid4().hex[:8]}")
            with open(tmp, "wb") as f:
                f.write(content)
            os.replace(tmp, save_path)  # atomic: no torn files on retry
        return (content if want_bytes else None, save_path, "success", None)
    except Exception as e:  # per-row DLQ isolation
        return (None, None, "failed", f"{type(e).__name__}: {e}")


@OPERATORS.register("download_file_mapper")
class DownloadFileMapper(Mapper):
    """Fetch `download_field` URLs; store bytes in `save_field` and/or
    files under `save_dir`. Adds `<download_field>_status` /
    `<download_field>_error` columns (and `<download_field>_path` when
    save_dir is set). Default matches the reference: with neither
    save_dir nor save_field, bytes land in `image_bytes`."""

    def __init__(self, download_field: Optional[str] = None,
                 save_dir: Optional[str] = None,
                 save_field: Optional[str] = None,
                 resume_download: bool = False, timeout: int = 30,
                 max_concurrent: int = 10, **kw):
        super().__init__(**kw)
        self.download_field = download_field or self.text_key
        self.save_dir = save_dir
        self.save_field = save_field
        if not (save_dir or save_field):
            self.save_field = "image_bytes"
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
        self.resume_download = resume_download
        self.timeout = timeout
        self.max_concurrent = max(int(max_concurrent), 1)

    def apply(self, df: DataFrame) -> DataFrame:
        save_dir, resume = self.save_dir, self.resume_download
        want_bytes = self.save_field is not None
        timeout, pool = self.timeout, self.max_concurrent

        @pandas_udf(_RESULT)
        def fetch(urls: pd.Series) -> pd.DataFrame:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=pool) as ex:
                rows = list(ex.map(
                    lambda u: _fetch_one(u, save_dir, want_bytes, resume,
                                         timeout),
                    urls))
            return pd.DataFrame(rows,
                                columns=["content", "path", "status",
                                         "error"])

        fld = self.download_field
        out = df.withColumn("__dl__", fetch(F.col(fld)))
        cols = [
            out["__dl__.status"].alias(f"{fld}_status"),
            out["__dl__.error"].alias(f"{fld}_error"),
        ]
        if self.save_dir:
            cols.append(out["__dl__.path"].alias(f"{fld}_path"))
        if self.save_field:
            cols.append(out["__dl__.content"].alias(self.save_field))
        return out.select("*", *cols).drop("__dl__")
