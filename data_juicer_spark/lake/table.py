"""SnapshotTable — an Iceberg-style keyed lake table on plain parquet.

Why not real Iceberg: no iceberg-spark-runtime jar ships in this
environment, so this module implements the same commit protocol shape
(immutable data files + snapshot metadata + one atomic pointer swap) in
~200 lines. The API is deliberately MERGE-INTO-shaped so a real Iceberg
catalog can be swapped in behind it (`spark.sql("MERGE INTO ...")`) when
the runtime jar is present — see `merge.py`.

Layout:
    <root>/metadata/snap-<id>.json   immutable snapshot manifests
    <root>/metadata/current          pointer file (atomic os.replace)
    <root>/data/snap-<id>/bucket=K/  parquet files for buckets REWRITTEN
                                     by that snapshot

Scale design — bucket-level copy-on-write:
  Rows are hash-bucketed on the upsert key (pmod(xxhash64(repo,path), B)).
  A MERGE only rewrites buckets that contain changed keys; untouched
  buckets are carried forward BY REFERENCE in the new manifest. At
  10^10 events over ~10^8 keys, a micro-batch touches a small fraction
  of buckets, so merge cost is O(changed data), not O(table size) —
  the same file-pruning effect Iceberg gets from partition + bloom
  pruning on the merge join.

Exactly-once:
  Each snapshot manifest records the epoch that produced it. Committing
  epoch E when current epoch >= E is a no-op (idempotent re-delivery);
  the pointer swap is a single atomic rename, so a crash before the
  swap leaves the previous snapshot intact (data files are orphaned,
  never half-visible).

Schema evolution:
  Manifests carry the table schema. New columns in an incoming batch
  widen the schema (add-only, like the reference's dynamic column adds,
  dj_dataset.py:473-486); carried-forward buckets are read with
  mergeSchema + null-fill, so old files never need rewriting.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str,
                 key_cols: List[str], num_buckets: int = 64):
        self.spark = spark
        self.root = root.rstrip("/")
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        os.makedirs(f"{self.root}/metadata", exist_ok=True)
        os.makedirs(f"{self.root}/data", exist_ok=True)

    # -- metadata ----------------------------------------------------------

    def _pointer(self) -> str:
        return f"{self.root}/metadata/current"

    def current_snapshot(self) -> Optional[dict]:
        try:
            with open(self._pointer()) as f:
                snap_id = f.read().strip()
        except FileNotFoundError:
            return None
        with open(f"{self.root}/metadata/snap-{snap_id}.json") as f:
            return json.load(f)

    def current_epoch(self) -> int:
        snap = self.current_snapshot()
        return snap["epoch"] if snap else -1

    def snapshot_history(self) -> List[dict]:
        out = []
        snap = self.current_snapshot()
        while snap is not None:
            out.append(snap)
            parent = snap.get("parent")
            if parent is None:
                break
            with open(f"{self.root}/metadata/snap-{parent}.json") as f:
                snap = json.load(f)
        return out

    def _commit(self, manifest: dict) -> dict:
        snap_id = manifest["snapshot_id"]
        path = f"{self.root}/metadata/snap-{snap_id}.json"
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1)
        tmp = f"{self._pointer()}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(snap_id)
        os.replace(tmp, self._pointer())  # atomic pointer swap
        return manifest

    # -- read --------------------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(self.num_buckets)
        ).cast("int")

    def read(self, buckets: Optional[List[int]] = None) -> Optional[DataFrame]:
        """Current table state. `buckets` prunes to listed buckets only
        (the merge path reads just the changed buckets)."""
        snap = self.current_snapshot()
        if snap is None:
            return None
        schema = T.StructType.fromJson(snap["schema"])
        dirs = [
            d for b, d in snap["buckets"].items()
            if buckets is None or int(b) in set(buckets)
        ]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        df = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*dirs)
        )
        # null-fill columns added after a referenced file was written
        for field in schema.fields:
            if field.name not in df.columns:
                df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
        return df.select([f.name for f in schema.fields])

    # -- write / merge -----------------------------------------------------

    def _write_buckets(self, df: DataFrame, snap_id: str) -> str:
        """Write df hash-partitioned by bucket; returns the data dir.
        repartition on the bucket column co-locates each bucket into one
        shuffle partition before partitionBy, so each bucket=K dir gets
        one file per shuffle partition that holds it (no small-file
        explosion)."""
        out = f"{self.root}/data/snap-{snap_id}"
        (
            df.withColumn("__bucket__", self._bucket_expr())
            .repartition(min(self.num_buckets, 256), "__bucket__")
            .write.partitionBy("__bucket__")
            .mode("overwrite")
            .parquet(out)
        )
        return out

    def _bucket_dirs(self, data_dir: str) -> dict:
        return {
            int(name.split("=")[1]): f"{data_dir}/{name}"
            for name in os.listdir(data_dir)
            if name.startswith("__bucket__=")
        }

    def init(self, df: DataFrame, epoch: int = -1) -> dict:
        """Create the first snapshot from a full dataframe."""
        snap_id = self._new_snap_id()
        data_dir = self._write_buckets(df, snap_id)
        manifest = {
            "snapshot_id": snap_id,
            "parent": None,
            "epoch": epoch,
            "schema": df.drop("__bucket__").schema.jsonValue(),
            "buckets": {str(b): d for b, d in self._bucket_dirs(data_dir).items()},
            "committed_at": time.time(),
            "operation": "init",
        }
        return self._commit(manifest)

    def _new_snap_id(self) -> str:
        return f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"

    def merge(self, upserts: Optional[DataFrame], delete_keys: Optional[DataFrame],
              epoch: int) -> dict:
        """MERGE INTO: upsert rows keyed on key_cols, delete listed keys.

        Idempotent epoch fence: if current epoch >= epoch, returns the
        current manifest unchanged (exactly-once under re-delivery).
        Only buckets containing changed keys are rewritten; the rest are
        carried forward by reference.
        """
        cur = self.current_snapshot()
        if cur is not None and cur["epoch"] >= epoch:
            return cur  # fenced: this epoch (or later) already committed

        if cur is None:
            if upserts is None:
                raise ValueError("cannot merge deletes into an empty table")
            return self.init(upserts, epoch=epoch)

        # 1. changed buckets = buckets of any upserted or deleted key
        change_keys = None
        if upserts is not None:
            change_keys = upserts.select(*self.key_cols)
        if delete_keys is not None:
            dk = delete_keys.select(*self.key_cols)
            change_keys = dk if change_keys is None else change_keys.unionByName(dk)
        changed_buckets = sorted(
            r[0]
            for r in change_keys.select(self._bucket_expr().alias("b"))
            .distinct()
            .collect()
        )
        if not changed_buckets:
            return cur

        # 2. rewrite only those buckets: existing rows minus changed keys,
        #    plus upserts (join is bucket-pruned on the read side)
        old = self.read(buckets=changed_buckets)
        all_keys = change_keys.distinct()
        survivors = old.join(all_keys, on=self.key_cols, how="left_anti")
        new_rows = survivors
        if upserts is not None:
            new_rows = survivors.unionByName(upserts, allowMissingColumns=True)
            # schema evolution: null-fill columns the other side lacks
        snap_id = self._new_snap_id()
        data_dir = self._write_buckets(new_rows, snap_id)
        new_dirs = self._bucket_dirs(data_dir)

        # 3. manifest: carried-forward buckets by reference + rewritten ones
        buckets = dict(cur["buckets"])
        for b in changed_buckets:
            buckets.pop(str(b), None)
        for b, d in new_dirs.items():
            buckets[str(b)] = d

        # evolved schema = old fields + any new upsert fields (add-only)
        old_schema = T.StructType.fromJson(cur["schema"])
        names = {f.name for f in old_schema.fields}
        evolved = list(old_schema.fields)
        if upserts is not None:
            for f in upserts.schema.fields:
                if f.name not in names:
                    evolved.append(f)
        manifest = {
            "snapshot_id": snap_id,
            "parent": cur["snapshot_id"],
            "epoch": epoch,
            "schema": T.StructType(evolved).jsonValue(),
            "buckets": buckets,
            "committed_at": time.time(),
            "operation": "merge",
            "rewritten_buckets": changed_buckets,
        }
        return self._commit(manifest)
