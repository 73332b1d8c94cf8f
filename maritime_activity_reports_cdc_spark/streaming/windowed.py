"""Event-time windowed streaming aggregation with watermarks (T3/T4).

The reference pipeline has no watermarked operators (its CDC apply is
key-based), but a transcript lake's operational side wants exactly this:
a continuously maintained per-minute activity rollup over the change
feed that tolerates LATE events — a turn event arriving after its
minute has passed still lands in the right window as long as it is
within the watermark; anything older than the watermark is dropped and
the window result is final (append mode emits a window exactly once,
when the watermark passes its end).

Spark-first shape: `withWatermark` + `groupBy(window(...))` keeps all
state in the streaming aggregation's state store — no custom state, no
Python in the loop — and the append-mode parquet sink gives replayable,
exactly-once window emission via the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from maritime_activity_reports_cdc_spark.sources.generator import CHANGE_SCHEMA


def windowed_activity(stream, window_dur: str = "1 minute", watermark: str = "10 minutes"):
    """The aggregation body (shared by the stream and any batch parity
    check): turns + tool calls per (event-time window, role)."""
    return (
        stream.where(F.col("ts").isNotNull() & F.col("role").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_dur).alias("w"), F.col("role"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.count("tool").cast("long").alias("n_tool_calls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_tool_calls",
        )
    )


def start_windowed_rollup(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_dur: str = "1 minute",
    watermark: str = "10 minutes",
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Watermarked per-window activity rollup over the transcript change
    feed, appended to parquet as windows FINALIZE (append output mode:
    a window is emitted exactly once, after the watermark passes its
    end — late rows within the watermark revise it before emission,
    rows beyond the watermark are dropped)."""
    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(feed_dir)
    agg = windowed_activity(stream, window_dur, watermark)
    writer = (
        agg.writeStream.queryName("windowed_activity")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
