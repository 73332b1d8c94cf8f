"""SparkSession factory.

Functional rebuild of the reference's session management
(``utils/spark_utils.py:13-81`` in /root/reference): AQE + partition
coalescing + skew-join on, Kryo, sane shuffle sizing — minus the Delta
extension (our lake layer is format-agnostic, see ``sources/lake.py``),
plus Arrow (our custom logic is vectorized pandas UDFs only, never
row-at-a-time Python) and a pinned UTC session timezone so results are
comparable against external oracles (DuckDB is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "transcripts-cdc-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-oriented defaults.

    ``shuffle_partitions`` defaults to the local core count: on a real
    cluster this would be ~2-3x total cores; the benchmark harness pins
    it explicitly per parallelism level so the N-vs-4N scaling run is
    apples-to-apples (BASELINE.md protocol).
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    cores = _core_count(master)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Catalyst runtime re-planning: partition coalescing + skew splits.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for the (few) pandas UDFs; never row-at-a-time.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # Deterministic cross-engine comparison (DuckDB oracle).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Scan split size: at production scale (files ~hundreds of MB)
        # the Spark default 128m is right; locally our bucket files are a
        # few MB and 128m bin-packs a whole table into one task,
        # serializing scans — so default small here, overridable.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16777216"),
        )
        # The manifest hands Spark EXACT leaf-file lists — there is no
        # directory tree to discover — yet above this threshold Spark
        # launches a whole listing JOB per read (InMemoryFileIndex
        # parallel discovery), ~0.2-0.3 s of serial driver+scheduler
        # time per table read; per-epoch that throttles the sparse-floor
        # regime and the N->4N scaling efficiency. Keep listing inline.
        # (Deployments on high-latency object stores that read
        # thousands-of-file tables per scan may lower it back.)
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_DISCOVERY_THRESHOLD", "65536"),
        )
        # Dynamic-partitioned writes: stream rows to one open writer per
        # partition value instead of sorting every task's rows by the
        # partition column first (spark.sql.maxConcurrentOutputFileWriters
        # > 0 skips FileFormatWriter's required-ordering sort until a task
        # exceeds the writer cap). Two effects on the relay hot path:
        # every partitioned commit drops a full per-task sort, and the
        # fused dedup-in-write stages no longer hold TWO full-partition
        # sorters alive at once (window sort + writer sort) — the peak
        # that could exhaust execution memory under concurrent
        # overlap/flush jobs. Tasks see at most a handful of bucket/month
        # values post-exchange, far under the cap; pathological writers
        # fall back to the sort automatically.
        .config(
            "spark.sql.maxConcurrentOutputFileWriters",
            os.environ.get("SPARK_GRAFT_CONCURRENT_WRITERS", "64"),
        )
        # Sized to cores x per-task sort working set (guide §5): 32 local
        # cores of fat-row sort/window tasks need real execution-memory
        # headroom once ingest, derived flushes and compaction overlap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def _core_count(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 4
        try:
            return int(inner)
        except ValueError:
            return 4
    return os.cpu_count() or 4
