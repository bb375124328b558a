"""Streaming analytics: watermarked windowed aggregation and the custom
stateful sessionization operator (applyInPandasWithState) — batch/stream
result parity on the same input."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_juicer_spark.streaming.windows import sessionize_stream, windowed_counts


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="stream_win_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _event_rows(spark):
    # two users; u1 has two sessions split by a >30min gap, u2 one session
    rows = [
        (1, "2024-01-01 10:00:00", 100, "click", 1.5),
        (2, "2024-01-01 10:10:00", 100, "click", 2.25),
        (3, "2024-01-01 11:30:00", 100, "view", 4.0),   # new session (80m gap)
        (4, "2024-01-01 10:05:00", 200, "view", 8.0),
        (5, "2024-01-01 10:20:00", 200, "click", 0.5),
        # late straggler that advances the watermark far past all sessions
        (6, "2024-01-02 00:00:00", 300, "click", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_windowed_counts_batch_stream_parity(spark, tmpd):
    """The SAME windowed_counts definition runs on a batch frame and on
    a file stream; results must match (watermark is a no-op on batch,
    and with availableNow the stream drains completely)."""
    events = _event_rows(spark)
    src = os.path.join(tmpd, "src")
    events.repartition(3).write.parquet(src)

    batch = {tuple(r) for r in windowed_counts(
        events, "1 hour", watermark="10 minutes").collect()}

    stream = spark.readStream.schema(events.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (windowed_counts(stream, "1 hour", watermark="10 minutes")
         .writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from win_counts").collect()}
    assert got == batch
    assert len(got) >= 3


def test_sessionize_stream_stateful(spark, tmpd):
    """Custom stateful operator: sessions close on in-stream gaps AND on
    event-time timeout once the watermark passes; totals are exact."""
    events = _event_rows(spark)
    src = os.path.join(tmpd, "src")
    # one file per event in EVENT-TIME order (a binlog tail is in-order;
    # rows behind the watermark are late data and correctly dropped), so
    # sessions span micro-batches
    for r in events.orderBy("ts", "event_id").collect():
        spark.createDataFrame([r], events.schema) \
            .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (sessionize_stream(stream, gap_seconds=1800, watermark="1 minute")
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql(
        "select * from sessions order by user_id, session_start").collect()
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], r["session_value"])
        for r in rows
    }
    # u1 session 1 closed by the in-stream gap; u1 session 2 and u2's
    # session closed by watermark timeout (the day-later straggler)
    assert (100, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.75) in got
    assert (100, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1, 4.0) in got
    assert (200, "2024-01-01 10:05:00", "2024-01-01 10:20:00", 2, 8.5) in got
    # u300's own session may stay open (no later watermark) — everything
    # before the straggler must have been emitted
    assert len(got) >= 3
