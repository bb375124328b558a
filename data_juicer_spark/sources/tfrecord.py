"""TFRecord shard source/sink (raw records, no protobuf).

The reference loads tfrecords through Ray datasources (core/data/
ray_dataset.py, lazy tfrecords dep). The TFRecord CONTAINER format is
public and protobuf-free — each record is framed as

    uint64-LE  length
    uint32-LE  masked_crc32c(length bytes)
    bytes      data[length]
    uint32-LE  masked_crc32c(data)

with ``masked = (rotr15(crc) + 0xa282ead8) mod 2^32`` and CRC-32C
(Castagnoli). So the reader is a `binaryFile` scan → Arrow-batched
`mapInPandas` record parser (one task per shard, embarrassingly
parallel), and the writer emits one shard per partition — the same
shape as sources/webdataset.py. The record PAYLOAD stays opaque bytes:
decoding `tf.train.Example` is a protobuf dep left to the caller
(documented stub, like the media codecs in operators/multimodal.py).

CRC is computed with a table-driven pure-Python loop — correct
(validated against the standard CRC-32C check value) but not fast; a
real deployment swaps `_crc32c` for google-crc32c. Reads skip CRC
validation by default (`verify_crc=True` to enable).
"""

from __future__ import annotations

import os
import struct
import uuid
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession

_POLY = 0x82F63B78  # CRC-32C (Castagnoli), reflected


def _make_table() -> List[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tbl = _TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _parse_records(content: bytes, verify_crc: bool,
                   shard: str) -> Iterator[bytes]:
    pos, n = 0, len(content)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(
                f"truncated TFRecord header at byte {pos} of {shard}")
        (length,) = struct.unpack_from("<Q", content, pos)
        (len_crc,) = struct.unpack_from("<I", content, pos + 8)
        data_end = pos + 12 + length
        if data_end + 4 > n:
            raise ValueError(
                f"truncated TFRecord payload at byte {pos} of {shard}")
        data = content[pos + 12:data_end]
        (data_crc,) = struct.unpack_from("<I", content, data_end)
        if verify_crc:
            if _masked_crc(content[pos:pos + 8]) != len_crc:
                raise ValueError(
                    f"length CRC mismatch at byte {pos} of {shard}")
            if _masked_crc(data) != data_crc:
                raise ValueError(
                    f"data CRC mismatch at byte {pos} of {shard}")
        yield data
        pos = data_end + 4


def read_tfrecord(spark: SparkSession, path: str,
                  value_col: str = "record",
                  verify_crc: bool = False) -> DataFrame:
    """Read TFRecord shards into one row per record:
    (shard string, idx long, <value_col> binary). `path` is any
    binaryFile glob (e.g. 'dir/*.tfrecord')."""
    schema = f"`shard` string, `idx` long, `{value_col}` binary"

    def parse(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(
                        _parse_records(bytes(content), verify_crc,
                                       shard_path)):
                    rows.append({"shard": shard_path, "idx": i,
                                 value_col: rec})
            yield pd.DataFrame(rows,
                               columns=["shard", "idx", value_col])

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(parse, schema=schema)
    )


def write_tfrecord(df: DataFrame, out_dir: str,
                   value_col: str = "record",
                   num_shards: Optional[int] = None) -> int:
    """Write the binary `value_col` as TFRecord shards (one file per
    partition, executor-local paths — shared FS / object store on a
    real cluster). Returns the number of records written."""
    os.makedirs(out_dir, exist_ok=True)
    if num_shards:
        df = df.repartition(num_shards)

    def write_partition(it):
        import pandas as pd

        # executor-side: the driver's makedirs doesn't exist on remote
        # workers under yarn/k8s
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        shard = os.path.join(out_dir,
                             f"part-{uuid.uuid4().hex[:12]}.tfrecord")
        fh = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if fh is None:
                fh = open(shard, "wb")
            for v in pdf[value_col]:
                data = bytes(v) if v is not None else b""
                header = struct.pack("<Q", len(data))
                fh.write(header)
                fh.write(struct.pack("<I", _masked_crc(header)))
                fh.write(data)
                fh.write(struct.pack("<I", _masked_crc(data)))
                n += 1
        if fh is not None:
            fh.close()
        yield pd.DataFrame({"n": [n]})

    counts = df.select(value_col).mapInPandas(
        write_partition, schema="n long").collect()
    return sum(r["n"] for r in counts)
