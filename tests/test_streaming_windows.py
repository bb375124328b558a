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


def test_sessionize_stream_matches_batch_on_real_events(spark, tmpd):
    """Batch<->stream equivalence on the REAL sf0.001 events table: the
    stateful streaming sessionizer must produce exactly the sessions of
    the oracle-verified batch query (_q_events_sessionize's lag +
    cumulative-window formulation) for every session that the stream's
    watermark can close. Ties the streaming operator to a driver-graded
    oracle instead of a hand-built fixture.

    The stream replays the month of events as 6 event-time-ordered
    range files (watermark advances between micro-batches; in-batch
    disorder is handled by the operator's sort). Sessions whose close
    condition lies above the final watermark legitimately stay open in
    the stream, so both sides are cut to sessions with
    last_event < max_ts - watermark - gap - margin."""
    import os

    from pyspark.sql import Window

    from data_juicer_spark.streaming.windows import sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "event_id",
                F.col("ts").cast("timestamp").alias("ts"), "value")
    # (the table ships TIMESTAMP_NTZ, which cannot carry a watermark —
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE; both twins use the same cast
    # so session boundaries stay identical)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    # cutoff in epoch seconds: watermark 60s + gap 1800s + 1s margin
    cutoff = max_ts.timestamp() - 60 - 1800 - 1

    # ---- batch twin (the oracle-verified formulation + session_end) --
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL '1800' SECOND")), 1
    ).otherwise(0)
    sess = events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)))
    batch = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
        .alias("micros"),
        F.max("ts").alias("session_end"),
    ).collect()
    batch_closed = sorted(
        (r["user_id"], r["n_events"], r["micros"]) for r in batch
        if r["session_end"].timestamp() < cutoff)
    assert len(batch_closed) >= 10  # the cut must keep a real corpus

    # ---- stream replay: 6 ordered range files ------------------------
    src = os.path.join(tmpd, "real_src")
    bounds = [r[0] for r in events.selectExpr(
        "percentile(cast(ts as double), array(1/6,2/6,3/6,4/6,5/6))"
    ).collect()[0][0]] if False else None
    # simple equal-count ranges via ntile on ts order
    ranked = events.withColumn(
        "__part__", F.ntile(6).over(Window.orderBy("ts", "event_id")))
    for p in range(1, 7):  # one write per range -> increasing mtimes
        ranked.where(F.col("__part__") == p).drop("__part__") \
            .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (sessionize_stream(stream, gap_seconds=1800, watermark="1 minute")
         .writeStream.format("memory").queryName("real_sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = spark.sql("select * from real_sessions").collect()
    stream_closed = sorted(
        (r["user_id"], r["n_events"],
         int(round(r["session_value"] * 1_000_000)))
        for r in got if r["session_end"].timestamp() < cutoff)

    assert stream_closed == batch_closed
