"""Gold layer: incremental business aggregates over silver state.

Rebuilds the reference gold layer (``gold/cdf_processor.py`` +
``gold/table_setup.py`` in /root/reference) — per-entity summaries (M6,
``:248-328``), grouped performance aggs (M7, ``:346-427``), compliance-
style multi-measure aggs (M8, ``:429-525``), daily rollups (A4,
``gold/table_setup.py:475-491``) — with the reference's central
scalability defect fixed:

- **G2**: the reference collect()s changed keys to the driver and runs one
  f-string MERGE per key (``gold/cdf_processor.py:239-246``). Here the
  affected-key set stays distributed: one semi-join restricts the agg
  source, one groupBy computes all affected aggregates, one
  partition-scoped replace commits them. Apply cost ∝ affected keys.

Summary measure vocabulary mirrors M6's shape (counts by category,
min/max timestamps, averages, conditional counts) translated to the
transcript domain.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maritime_activity_reports_cdc_spark.operators import mor
from maritime_activity_reports_cdc_spark.operators.apply import BUCKET_COL, bucket_expr
from maritime_activity_reports_cdc_spark.sources.lake import LakeTable

# the summary agg's input column set — passed into MoR-resolved silver
# reads so the resolve shuffle never carries text
SUMMARY_INPUT_COLS = [
    "conv_id", "role", "tool", "ts", "gap_secs", "n_tokens",
    "quality_score", "is_anomalous",
]

SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_user", T.LongType(), True),
        T.StructField("n_assistant", T.LongType(), True),
        T.StructField("n_system", T.LongType(), True),
        T.StructField("n_tool_calls", T.LongType(), True),
        T.StructField("n_distinct_tools", T.LongType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("duration_secs", T.DoubleType(), True),
        T.StructField("avg_gap_secs", T.DoubleType(), True),
        T.StructField("max_gap_secs", T.DoubleType(), True),
        T.StructField("total_tokens", T.LongType(), True),
        T.StructField("avg_quality", T.DoubleType(), True),
        T.StructField("n_anomalous", T.LongType(), True),
        T.StructField("risk_level", T.StringType(), True),
        T.StructField(BUCKET_COL, T.IntegerType(), False),
    ]
    + mor.GEN_FIELDS
)

DAILY_SCHEMA = T.StructType(
    [
        T.StructField("business_date", T.DateType(), False),
        T.StructField("n_active_conversations", T.LongType(), True),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_tool_calls", T.LongType(), True),
        T.StructField("total_tokens", T.LongType(), True),
        T.StructField("avg_quality", T.DoubleType(), True),
    ]
    + mor.GEN_FIELDS
)


def create_summary_table(
    spark: SparkSession, path: str, n_buckets: int = 16, layer_mode: str = "cow"
) -> LakeTable:
    return LakeTable.create(
        spark, path, SUMMARY_SCHEMA, partition_by=BUCKET_COL,
        properties={
            "n_buckets": n_buckets,
            "stats_cols": ["conv_id"],
            "layer_mode": layer_mode,
        },
    )


def create_daily_table(
    spark: SparkSession, path: str, layer_mode: str = "cow"
) -> LakeTable:
    # Partitioned by day — the reference's gold partition scheme
    # (``gold/table_setup.py:94``); rollup refresh replaces whole days
    # (CoW) or appends generation-tagged day rows resolved on read (MoR).
    return LakeTable.create(spark, path, DAILY_SCHEMA, partition_by="business_date",
                            properties={"layer_mode": layer_mode})


def read_summary(summary_table: LakeTable, buckets=None) -> DataFrame:
    if summary_table.properties().get("layer_mode") == "mor":
        return mor.read_resolved(summary_table, ["conv_id"], buckets)
    return summary_table.read() if buckets is None else summary_table.read_partitions(buckets)


def read_daily(daily_table: LakeTable) -> DataFrame:
    if daily_table.properties().get("layer_mode") == "mor":
        return mor.read_resolved(daily_table, ["business_date"])
    return daily_table.read()


def conversation_summary(silver_rows: DataFrame) -> DataFrame:
    """All per-conversation measures in ONE groupBy (M6 analog, set-
    oriented). Conditional counts via count(when(...)) — A3/A6 pattern."""
    cnt = lambda cond: F.count(F.when(cond, 1))  # noqa: E731
    agg = silver_rows.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        cnt(F.col("role") == "user").alias("n_user"),
        cnt(F.col("role") == "assistant").alias("n_assistant"),
        cnt(F.col("role") == "system").alias("n_system"),
        cnt(F.col("role") == "tool").alias("n_tool_calls"),
        F.countDistinct("tool").alias("n_distinct_tools"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))).alias("duration_secs"),
        F.avg("gap_secs").alias("avg_gap_secs"),
        F.max("gap_secs").alias("max_gap_secs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        cnt(F.col("is_anomalous")).alias("n_anomalous"),
    )
    # Risk CASE over aggregate counts — A6 shape (gold/cdf_processor.py:
    # 450-513 risk_score CASE).
    risk = (
        F.when(F.col("n_anomalous") > 5, "high")
        .when((F.col("n_anomalous") > 0) | (F.col("avg_quality") < 0.7), "medium")
        .otherwise("low")
    )
    return agg.withColumn("risk_level", risk)


def refresh_summary_for_conversations(
    silver_table: LakeTable,
    summary_table: LakeTable,
    affected,
    epoch: int,
    source: str = "gold_summary",
    enriched: DataFrame | None = None,
) -> bool:
    """Incremental recompute of exactly the affected conversations'
    summaries (agg-then-merge, M6 — minus the per-key driver loop).
    ``affected`` is a ``silver.AffectedSet`` (shared across layers).

    ``enriched`` — the silver refresh's freshly computed rows for the
    affected conversations — IS this refresh's aggregation input; passing
    it (persisted) skips the silver re-read entirely and removes the
    cross-layer commit dependency."""
    if summary_table.last_epoch(source) >= epoch:
        return False
    n_buckets = int(summary_table.properties()["n_buckets"])
    if not affected.buckets:
        summary_table.commit_epoch_noop(source, epoch, {"rows": 0})
        return True
    if enriched is None:
        from maritime_activity_reports_cdc_spark.plans.silver import read_silver

        # dense mode recomputes EVERY conversation of the buckets, so the
        # batch's conv-span bounds must not prune the scan
        silver_slice = read_silver(
            silver_table, affected.buckets,
            bounds=None if affected.dense else affected.prune(),
            columns=SUMMARY_INPUT_COLS,
        )
        enriched = affected.semi(silver_slice)
    fresh = conversation_summary(enriched).withColumn(
        BUCKET_COL, bucket_expr("conv_id", n_buckets)
    )
    if summary_table.properties().get("layer_mode") == "mor":
        # One delta append: fresh summaries + per-conv generation markers.
        # A conversation fully deleted upstream has a marker but no fresh
        # row, so it resolves to nothing on read.
        mor.append_generation(summary_table, fresh, affected.keys, epoch, source)
        return True
    fresh = mor.stamp_generation(fresh, epoch, rank=1)
    target_cols = [f.name for f in summary_table.schema().fields]
    # A conversation whose rows were ALL deleted upstream produces no
    # agg row — its stale summary must go too, which the anti-join +
    # union (or the whole-bucket replace in dense mode) guarantees.
    survivors = affected.anti(summary_table.read_partitions(affected.buckets))
    merged = (
        fresh.select(*target_cols)
        if survivors is None
        else survivors.unionByName(fresh.select(*target_cols))
    )
    summary_table.replace_partitions(
        merged, summary={"source": source}, epoch=(source, epoch),
        partition_values=affected.buckets,
    )
    return True


def refresh_summary_full(
    silver_table: LakeTable,
    summary_table: LakeTable,
    epoch: int,
    source: str = "gold_summary",
) -> bool:
    """Full summary rebuild from complete silver state — the catch-up
    path when a resume finds gold behind silver (the per-epoch affected
    sets of the missed epochs are unknowable after a crash)."""
    from maritime_activity_reports_cdc_spark.plans.silver import read_silver

    if summary_table.last_epoch(source) >= epoch:
        return False
    n_buckets = int(summary_table.properties()["n_buckets"])
    fresh = conversation_summary(
        read_silver(silver_table, columns=SUMMARY_INPUT_COLS)
    ).withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets))
    fresh = mor.stamp_generation(fresh, epoch, rank=1)
    target_cols = [f.name for f in summary_table.schema().fields]
    summary_table.overwrite(
        fresh.select(*target_cols), summary={"source": source, "operation_kind": "full"},
        epoch=(source, epoch),
    )
    return True


def refresh_daily_rollup(
    silver_table: LakeTable,
    daily_table: LakeTable,
    affected_dates: DataFrame | None,
    epoch: int,
    source: str = "gold_daily",
) -> bool:
    """Daily activity rollup (A4 analog) — incremental by business_date:
    only days present in the change batch are recomputed and replaced.
    ``affected_dates`` None means full rebuild.

    The recompute must see ALL conversations active on the affected dates
    (not just changed ones), so it scans by DATE, not by key — the ts
    file bounds in the silver manifests turn that into a scan of just the
    files overlapping the date window (time-correlated ingest keeps each
    file's ts range narrow)."""
    from maritime_activity_reports_cdc_spark.plans.silver import read_silver

    if daily_table.last_epoch(source) >= epoch:
        return False
    if affected_dates is not None:
        dates = [r[0] for r in affected_dates.distinct().collect()]
        if not dates:
            daily_table.commit_epoch_noop(source, epoch, {"rows": 0})
            return True
        lo = min(dates).isoformat()
        hi = (max(dates) + dt.timedelta(days=1)).isoformat()
        # ts bounds prune silver BASE files only (delta generations must
        # be read whole — see mor.read_resolved); safe because base rows
        # of one conversation are single-generation after compaction.
        silver_rows = read_silver(
            silver_table, bounds={"ts": (lo, hi)},
            columns=["conv_id", "ts", "role", "n_tokens", "quality_score"],
        )
        rows = silver_rows.withColumn("business_date", F.to_date("ts")).where(
            F.col("business_date").isin(dates)
        )
    else:
        dates = None
        rows = read_silver(
            silver_table,
            columns=["conv_id", "ts", "role", "n_tokens", "quality_score"],
        ).withColumn("business_date", F.to_date("ts"))
    rollup = rows.groupBy("business_date").agg(
        F.countDistinct("conv_id").alias("n_active_conversations"),
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col("role") == "tool", 1)).alias("n_tool_calls"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )
    if daily_table.properties().get("layer_mode") == "mor" and dates is not None:
        spark = silver_rows.sparkSession
        marker_keys = spark.createDataFrame(
            [(d,) for d in dates], T.StructType([T.StructField("business_date", T.DateType(), False)])
        )
        mor.append_generation(daily_table, rollup, marker_keys, epoch, source)
        return True
    rollup = mor.stamp_generation(rollup, epoch, rank=1)
    if dates is None:
        daily_table.overwrite(rollup, summary={"source": source}, epoch=(source, epoch))
    else:
        daily_table.replace_partitions(
            rollup, summary={"source": source}, epoch=(source, epoch),
            partition_values=dates,
        )
    return True


def top_conversations_view(summary_table: LakeTable, k: int = 10) -> DataFrame:
    """Rank view (W6 analog, ``gold/table_setup.py:466-471``): top-k
    conversations by turns within each risk level."""
    from pyspark.sql import Window

    w = Window.partitionBy("risk_level").orderBy(F.desc("n_turns"), "conv_id")
    return (
        read_summary(summary_table)
        .withColumn("rank_in_risk", F.rank().over(w))
        .where(F.col("rank_in_risk") <= k)
        .orderBy("risk_level", "rank_in_risk")
    )
