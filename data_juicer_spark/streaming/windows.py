"""Event-time streaming analytics: watermarked windowed aggregation and
a custom stateful sessionization operator.

The reference has no streaming layer (SURVEY.md §2.7); these are the
idiomatic Structured-Streaming primitives this engine adds on top of
the CDC path:

- ``windowed_counts``: tumbling/sliding event-time windows with a late-
  data watermark — state is bounded because the watermark lets Spark
  finalize and evict windows older than (max event time − delay).
- ``sessionize_stream``: gap-based sessions as a CUSTOM stateful
  operator via ``applyInPandasWithState`` (the reference has nothing
  stateful; batch `events_sessionize` in __spark_entry__.py is the
  batch twin of this operator). Sessions close either when a later
  event for the same user arrives past the gap, or when the watermark
  passes (event-time timeout) — so output is complete AND state is
  bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window_duration: str = "1 hour",
                    slide: str | None = None, watermark: str = "30 minutes",
                    ts_col: str = "ts", keys=("event_type",),
                    value_col: str | None = "value") -> DataFrame:
    """Watermarked event-time windowed aggregation. Works on both batch
    and streaming frames (on batch the watermark is a no-op), so the
    same definition serves backfill and the live stream."""
    win = (F.window(ts_col, window_duration, slide) if slide
           else F.window(ts_col, window_duration))
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col and value_col in events.columns:
        # order-independent exact sum (integer micros), same trick as the
        # batch oracles
        aggs.append(
            F.round(F.sum(F.round(F.col(value_col) * 1_000_000).cast("long"))
                    / F.lit(1_000_000.0), 4).alias("sum_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *keys)
        .agg(*aggs)
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"), *keys,
                *[a for a in ("cnt", "sum_value")
                  if a == "cnt" or len(aggs) > 1])
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, session_value double"
)
SESSION_STATE_SCHEMA = "start double, last double, n long, v long"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "1 minute",
                      ts_col: str = "ts", user_col: str = "user_id",
                      value_col: str = "value") -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    State per user: (session_start, last_event, n_events, value_micros).
    A session closes when a subsequent event arrives more than
    ``gap_seconds`` later (emitted immediately) or when the event-time
    watermark passes last_event + gap (timeout — emits the final open
    session and clears state, so state size is bounded by active users).
    Values accumulate as integer micros: exact and order-independent.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = float(gap_seconds)

    def fn(key, pdf_iter, state):
        import pandas as pd

        uid = key[0]

        def emit(start, last, n, v_micros):
            # construct at MICROsecond precision: Spark timestamps are
            # us, and pd.Timestamp(float_secs, unit="s") lands on ns —
            # real-data fractional seconds then fail Arrow's safe
            # ns->us narrowing (found by the batch-equivalence test on
            # the sf0.001 events table, which carries us precision)
            return pd.DataFrame({
                "user_id": [uid],
                "session_start": [pd.Timestamp(round(start * 1e6),
                                               unit="us")],
                "session_end": [pd.Timestamp(round(last * 1e6),
                                             unit="us")],
                "n_events": [n],
                "session_value": [v_micros / 1_000_000.0],
            })

        if state.hasTimedOut:
            start, last, n, v = state.get
            state.remove()
            yield emit(start, last, n, v)
            return

        rows = pd.concat(list(pdf_iter))
        secs = rows[ts_col].astype("int64").to_numpy() / 1e9
        vals = rows[value_col].to_numpy()
        order = secs.argsort(kind="mergesort")
        cur = state.get if state.exists else None
        for i in order:
            t, v_micro = float(secs[i]), int(round(float(vals[i]) * 1e6))
            if cur is None:
                cur = (t, t, 1, v_micro)
            elif t - cur[1] > gap:
                yield emit(*cur)
                cur = (t, t, 1, v_micro)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v_micro)
        state.update(cur)
        # timeout must sit strictly above the current watermark (Spark
        # rejects past timestamps when a session is already expired at
        # set time — the next trigger's timeout path then emits it)
        timeout_ms = max(int((cur[1] + gap) * 1000) + 1,
                         state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout)
    )
