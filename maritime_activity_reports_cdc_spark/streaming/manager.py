"""Streaming query lifecycle management (SURVEY.md §2.10 T8).

Functional rebuild of the reference's processor lifecycle surface —
monitor via ``query.lastProgress`` (``silver/streaming_processor.py:
193-235`` in /root/reference), ``stop_all_streaming_queries`` (`:237-252`),
``restart_failed_queries`` (`:254-277`) and ``health_check`` (`:342`) —
over the engine's own runners. Differences by design:

- queries are registered with a restart FACTORY, so a restart resumes
  from the Structured Streaming checkpoint and the per-table epoch
  guards make any replayed batch a no-op (exactly-once holds across
  restarts, which the reference's restart path does not guarantee);
- progress metrics persist to a ``_stream_metrics`` lake table with the
  reference's metric vocabulary (``inputRowsPerSecond``,
  ``processedRowsPerSecond``, ``batchDuration`` — ``docs/API.md:365-374``),
  not just logs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from maritime_activity_reports_cdc_spark.sources.lake import LakeTable

STREAM_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("progress_ts", T.StringType(), True),
        T.StructField("num_input_rows", T.LongType(), True),
        T.StructField("input_rows_per_second", T.DoubleType(), True),
        T.StructField("processed_rows_per_second", T.DoubleType(), True),
        T.StructField("batch_duration_ms", T.LongType(), True),
    ]
)


@dataclass
class ManagedQuery:
    name: str
    start_fn: Callable[[], "object"]  # () -> StreamingQuery
    query: object = None
    restarts: int = 0
    last_error: str | None = None
    _seen_batches: set = field(default_factory=set)


class StreamManager:
    """Start/monitor/stop/restart a set of streaming queries."""

    def __init__(self, spark: SparkSession, metrics_path: str | None = None):
        self.spark = spark
        self.queries: dict[str, ManagedQuery] = {}
        self.metrics_table: LakeTable | None = None
        if metrics_path is not None:
            self.metrics_table = (
                LakeTable.load(spark, metrics_path)
                if LakeTable.exists(metrics_path)
                else LakeTable.create(spark, metrics_path, STREAM_METRICS_SCHEMA)
            )

    # -- lifecycle -------------------------------------------------------
    def register(self, name: str, start_fn: Callable[[], "object"]) -> "object":
        """Register a restartable query factory and start it."""
        mq = ManagedQuery(name=name, start_fn=start_fn)
        mq.query = start_fn()
        self.queries[name] = mq
        return mq.query

    def stop_all(self) -> list[str]:
        stopped = []
        for mq in self.queries.values():
            if mq.query is not None and mq.query.isActive:
                mq.query.stop()
                stopped.append(mq.name)
        return stopped

    def restart_failed(self) -> list[str]:
        """Restart every registered query that died WITH an error (a
        cleanly finished bounded query stays finished). Safe because a
        restart resumes from the checkpoint and any replayed microbatch
        hits the engine's epoch guards and no-ops."""
        restarted = []
        for mq in self.queries.values():
            q = mq.query
            if q is None or q.isActive:
                continue
            try:
                exc = q.exception()
            except Exception:
                exc = None
            if exc is None:
                continue
            mq.last_error = str(exc)
            mq.query = mq.start_fn()
            mq.restarts += 1
            restarted.append(mq.name)
        return restarted

    def await_all(self, timeout_secs: float | None = None) -> None:
        deadline = None if timeout_secs is None else time.monotonic() + timeout_secs
        for mq in self.queries.values():
            if mq.query is None:
                continue
            remaining = None if deadline is None else max(0.0, deadline - time.monotonic())
            mq.query.awaitTermination(remaining)

    # -- observability ---------------------------------------------------
    def health_check(self) -> dict[str, dict]:
        """Per-query health in the reference's vocabulary
        (``gold/streaming_processor.py:324-339``)."""
        out = {}
        for mq in self.queries.values():
            q = mq.query
            lp = q.lastProgress if q is not None else None
            out[mq.name] = {
                "active": bool(q is not None and q.isActive),
                "restarts": mq.restarts,
                "last_error": mq.last_error,
                "batch_id": lp.get("batchId") if lp else None,
                "inputRowsPerSecond": lp.get("inputRowsPerSecond") if lp else None,
                "processedRowsPerSecond": lp.get("processedRowsPerSecond") if lp else None,
                "batchDuration": (lp.get("durationMs") or {}).get("triggerExecution") if lp else None,
            }
        return out

    def collect_progress(self) -> int:
        """Drain each query's new progress entries into the metrics
        table. Returns rows written. Observability only — losing a poll
        never affects data correctness."""
        rows = []
        for mq in self.queries.values():
            q = mq.query
            if q is None:
                continue
            for lp in q.recentProgress:
                bid = lp.get("batchId")
                if bid is None or bid in mq._seen_batches:
                    continue
                mq._seen_batches.add(bid)
                rows.append(
                    (
                        mq.name,
                        int(bid),
                        lp.get("timestamp"),
                        int(lp.get("numInputRows") or 0),
                        float(lp.get("inputRowsPerSecond") or 0.0),
                        float(lp.get("processedRowsPerSecond") or 0.0),
                        int((lp.get("durationMs") or {}).get("triggerExecution") or 0),
                    )
                )
        if rows and self.metrics_table is not None:
            self.metrics_table.append(
                self.spark.createDataFrame(rows, STREAM_METRICS_SCHEMA)
            )
        return len(rows)

    def monitor(
        self,
        poll_secs: float = 5.0,
        max_polls: int | None = None,
        restart: bool = True,
        until_idle: bool = False,
    ) -> dict[str, dict]:
        """Reference-style monitor loop (``silver/streaming_processor.py:
        193-235``): poll progress into the metrics table, optionally
        restart dead queries, stop when all queries finished (or
        ``max_polls``). Returns the final health snapshot."""
        polls = 0
        while True:
            self.collect_progress()
            if restart:
                self.restart_failed()
            health = self.health_check()
            if until_idle and not any(h["active"] for h in health.values()):
                return health
            polls += 1
            if max_polls is not None and polls >= max_polls:
                return health
            time.sleep(poll_secs)
