"""CdcReplayer — replays a binlog-style event log into a SnapshotTable
through a Data-Juicer-style operator pipeline.

Per micro-batch (epoch):
  1. in-batch compaction: last event per (repo,path) by seq wins
     (delete beats earlier upserts, later upsert resurrects);
  2. operator pipeline runs on the surviving UPSERT payloads only
     (vectorized mappers/filters; rows a Filter drops become DELETES —
     a file that fails quality gates must not remain in the lake);
  3. MERGE INTO the snapshot table keyed (repo,path), epoch-fenced
     (re-delivering an already-committed epoch is a no-op);
  4. per-epoch lineage/metrics recorded (rows in/out per op boundary,
     upserts/deletes, snapshot id) — the Tracer/Analyzer mirror
     (/root/reference/data_juicer/core/monitor.py, tracer.py).

Resume-from-checkpoint falls out of the design: the table's current
epoch IS the checkpoint; a restarted replay skips every epoch <= it.

Skew: the upsert shuffle keys on (repo,path) — path cardinality inside
a hot repo spreads the hash space. In-batch compaction is a map-side-
combinable max_by aggregation, so even a single flooded key collapses
to one partial row per map task before the shuffle; the optional
`salt_buckets` adds a two-level reduce on top for adversarial cases.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_juicer_spark.lake.table import SnapshotTable
from data_juicer_spark.pipeline import Pipeline

KEY_COLS = ["repo", "path"]


@dataclass
class EpochStats:
    epoch: int
    events: int = 0
    upserts: int = 0
    deletes: int = 0
    filtered_out: int = 0
    snapshot_id: Optional[str] = None
    skipped: bool = False
    seconds: float = 0.0
    op_stats: dict = field(default_factory=dict)


class CdcReplayer:
    def __init__(self, table: SnapshotTable, pipeline: Optional[Pipeline] = None,
                 text_key: str = "content", salt_buckets: int = 0,
                 collect_op_stats: bool = False):
        self.table = table
        self.pipeline = pipeline
        self.text_key = text_key
        self.salt_buckets = salt_buckets
        self.collect_op_stats = collect_op_stats
        self.lineage: List[EpochStats] = []

    # -- batch compaction ---------------------------------------------------

    def compact(self, events: DataFrame) -> DataFrame:
        """Last event per (repo,path) by seq within the batch, as ONE
        map-side-combinable max_by aggregation: each map task reduces
        every key it sees (including a hot key) to a single partial row
        BEFORE the shuffle, so shuffled bytes are O(distinct keys per
        task), not O(events) — the row_number-window formulation this
        replaces shuffled every event and sorted per partition. The
        payload struct is built from the event schema, so evolved
        columns survive. `salt_buckets` adds an explicit two-level
        reduce for adversarial single-key floods (rarely needed now that
        partial aggregation already collapses per-task)."""
        payload = [c for c in events.columns if c not in KEY_COLS]
        if self.salt_buckets > 1:
            salted = events.withColumn(
                "__salt__", F.pmod(F.col("seq"), F.lit(self.salt_buckets))
            )
            level1 = salted.groupBy(*KEY_COLS, "__salt__").agg(
                F.max_by(F.struct(*payload), "seq").alias("__last__")
            )
            level2 = level1.groupBy(*KEY_COLS).agg(
                F.max_by("__last__", F.col("__last__.seq")).alias("__last__")
            )
            return level2.select(*KEY_COLS, "__last__.*")
        return (
            events.groupBy(*KEY_COLS)
            .agg(F.max_by(F.struct(*payload), "seq").alias("__last__"))
            .select(*KEY_COLS, "__last__.*")
        )

    # -- one epoch ----------------------------------------------------------

    def apply_epoch(self, events: DataFrame, epoch: int) -> EpochStats:
        st = EpochStats(epoch=epoch)
        t0 = time.time()
        if self.table.current_epoch() >= epoch:
            st.skipped = True
            st.seconds = time.time() - t0
            self.lineage.append(st)
            return st

        # ONE lineage: compact → pipeline-in-flag-mode → persist. Rows a
        # quality Filter rejects carry __keep__=false instead of being
        # dropped, so kept rows, demoted-to-delete keys AND all counts
        # come from the same materialized batch — no anti-join, no
        # pipeline recomputation (each epoch = compact shuffle + one
        # pandas/Catalyst pass + the merge writes).
        last = self.compact(events)
        if self.pipeline is not None:
            # D rows ride through the pipeline with null content (mappers
            # are null-safe); their flag is irrelevant — op=='D' wins
            flagged = self.pipeline.apply(last, filter_mode="flag")
        else:
            flagged = last.withColumn("__keep__", F.lit(True))
        is_del = F.col("op") == "D"
        is_kept = (~is_del) & F.coalesce(F.col("__keep__"), F.lit(False))
        flagged = flagged.withColumn("__kept__", is_kept)

        if self.table.strategy == "mor":
            # fast path: ONE shuffle + ONE write job per epoch; counts
            # ride the write via observe() instead of a separate action
            from pyspark.sql.observation import Observation

            obs = Observation(f"epoch_{epoch}")
            flagged = flagged.observe(
                obs,
                F.sum(F.col("__kept__").cast("long")).alias("n_up"),
                F.sum(is_del.cast("long")).alias("n_del"),
                F.count(F.lit(1)).alias("n_events"),
            )
            manifest = self.table.merge_combined(flagged, "__kept__", epoch)
            metrics = obs.get
            st.upserts = metrics["n_up"] or 0
            st.events = metrics["n_events"] or 0
            st.filtered_out = st.events - st.upserts - (metrics["n_del"] or 0)
            st.deletes = st.events - st.upserts
            st.snapshot_id = manifest["snapshot_id"]
        else:
            flagged = flagged.persist()
            try:
                counts = {
                    (bool(r["d"]), bool(r["k"])): r["cnt"]
                    for r in flagged.groupBy(is_del.alias("d"),
                                             F.col("__kept__").alias("k"))
                    .agg(F.count("*").alias("cnt")).collect()
                }
                n_up = counts.get((False, True), 0)
                st.filtered_out = counts.get((False, False), 0)
                n_del_in = counts.get((True, False), 0)

                upserts = flagged.where(F.col("__kept__")) \
                    .drop("op", "__keep__", "__kept__")
                deletes = flagged.where(~F.col("__kept__")).select(*KEY_COLS)
                st.upserts = n_up
                st.deletes = n_del_in + st.filtered_out
                st.events = n_up + st.deletes

                manifest = self.table.merge(
                    upserts if n_up else None,
                    deletes if st.deletes else None,
                    epoch=epoch,
                )
                st.snapshot_id = manifest["snapshot_id"]
            finally:
                flagged.unpersist()
        if self.collect_op_stats and self.pipeline is not None:
            try:
                st.op_stats = self.pipeline.op_stats()
            except Exception:
                pass
        st.seconds = time.time() - t0
        self.lineage.append(st)
        return st

    # -- full replay ----------------------------------------------------------

    def replay(self, events: DataFrame, start_epoch: Optional[int] = None,
               end_epoch: Optional[int] = None,
               cache: Optional[bool] = None) -> List[EpochStats]:
        """Replay epochs [start, end]. Default start resumes after the
        table's current epoch (checkpoint = committed epoch).

        cache: whether to persist `events` for the epoch loop.
          None (default) — persist only when the plan is NOT already a
          file scan: a synthesized/derived input would otherwise be
          recomputed once per epoch, but a file-backed log already
          serves each epoch via a pruned scan (epoch predicate pushed
          to the format), and force-caching the FULL log is exactly
          what a 10^10-event replay must never do — the columnar cache
          of the whole binlog competes with shuffle/UDF memory and
          collapses long before the replay path itself is stressed.
          True/False — explicit override (a caller replaying a small
          derived batch repeatedly may want True; benchmarks that
          model production log-tailing want False)."""
        if start_epoch is None:
            start_epoch = self.table.current_epoch() + 1
        if end_epoch is None:
            end_epoch = events.agg(F.max("epoch")).collect()[0][0]
            if end_epoch is None:
                return []
        if cache is None:
            # file-backed plans re-read only the pruned epoch slice;
            # a synthesized/derived input would recompute per epoch
            try:
                file_backed = bool(events.inputFiles())
            except Exception:
                file_backed = False
            cache = not file_backed
        # don't double-persist (and never unpersist) a cache the caller owns
        owns_cache = cache and events.storageLevel.useMemory is False \
            and events.storageLevel.useDisk is False
        if owns_cache:
            events = events.persist()
        try:
            out = []
            for ep in range(start_epoch, end_epoch + 1):
                batch = events.where(F.col("epoch") == ep)
                out.append(self.apply_epoch(batch, ep))
            return out
        finally:
            if owns_cache:
                events.unpersist()
