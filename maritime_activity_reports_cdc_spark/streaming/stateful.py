"""Custom stateful streaming (T5): session tracking with
``applyInPandasWithState``.

The windowed rollup (``streaming/windowed.py``) covers what built-in
watermarked aggregation can express. Sessionization cannot be expressed
that way — a session's extent depends on the DATA (the gap to the next
event), not on a fixed window grid — so it is the engine's one genuinely
custom stateful operator: per-user state (current session's start, last
event time, counts) carried across microbatches in the state store,
sessions emitted when CLOSED, either by an explicit gap in the data or
by an event-time timeout once the watermark passes last_ts + gap.

This is the sanctioned Python surface for stateful logic: Arrow-batched
pandas per group (never row-at-a-time Python over the stream), state
explicitly schema'd, timeouts from the watermark clock. The batch twin
(``queries.session_segmentation``) computes the same sessions with
windows; the streaming test checks they agree on closed sessions.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

# state: (session_start_us, last_ts_us, n_events)
SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _session_fn(key, pdf_iter, state: GroupState):
    """Per-user session fold. Emits one row per CLOSED session; the open
    session lives in the state store with an event-time timeout at
    last_ts + gap (fires when the watermark passes it)."""
    user_id = key[0]
    closed = []

    if state.hasTimedOut:
        # watermark passed last_ts + gap with no new events: close it
        if state.exists:
            start_us, last_us, n = state.get
            closed.append((user_id, start_us, last_us, n))
            state.remove()
        for _ in pdf_iter:  # pragma: no cover - timeout calls carry no data
            pass
    else:
        start_us = last_us = None
        n = 0
        if state.exists:
            start_us, last_us, n = state.get
        events = pd.concat(list(pdf_iter), ignore_index=True)
        events = events.sort_values("ts", kind="mergesort")
        for ts in events["ts"]:
            ts_us = _us(ts)
            if last_us is not None and ts_us - last_us > GAP_US:
                closed.append((user_id, start_us, last_us, n))
                start_us, n = ts_us, 0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp((last_us + GAP_US) // 1000)

    out = pd.DataFrame(
        closed, columns=["user_id", "start_us", "last_us", "n_events"]
    )
    if not out.empty:
        out["session_start"] = pd.to_datetime(out.pop("start_us"), unit="us")
        out["session_end"] = pd.to_datetime(out.pop("last_us"), unit="us")
    else:
        out = pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )
    yield out[["user_id", "session_start", "session_end", "n_events"]]


def start_session_stream(
    spark: SparkSession,
    feed_dir: str,
    feed_schema,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming sessionization over an event feed (columns must include
    ``user_id`` long and ``ts`` timestamp): closed sessions append to
    parquet; open sessions persist in the state store across restarts."""
    stream = (
        spark.readStream.schema(feed_schema)
        .parquet(feed_dir)
        .where("ts IS NOT NULL AND user_id IS NOT NULL")
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.queryName("session_stream")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
