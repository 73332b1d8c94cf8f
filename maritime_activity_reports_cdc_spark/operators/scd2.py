"""SCD Type 2 apply: versioned dimension maintenance from a change feed.

Rebuilds the reference's SCD2 MERGEs (M1 ``bronze/cdc_ingestion.py:169-224``,
M3 ``silver/cdf_processor.py:277-332`` in /root/reference — vessel metadata
with ``valid_from_datetime / valid_to_datetime / is_current_record``) as one
set-oriented plan with two properties the reference lacks:

1. **Multi-change-per-key batches are legal** (G1): all changes for a key
   in a batch become a chain of versions via ``lead()`` over the batch,
   instead of making Delta MERGE throw on multiple source matches.
2. **Deletes close history** (G7): a ``D`` event closes the current
   version without opening a new one.

Semantics: for each key, order its batch events by ``(lsn, op_ordinal)``;
every I/U event opens a version valid from its effective timestamp and
closed by the next event's timestamp (``lead``), the last one staying open
(current). The target's previously-current version is closed at the
batch's FIRST event timestamp for that key. Closed history rows are
immutable — the apply only rewrites buckets containing affected keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maritime_activity_reports_cdc_spark.operators.apply import BUCKET_COL, bucket_expr
from maritime_activity_reports_cdc_spark.sources.lake import LakeTable

SCD2_META_FIELDS = [
    T.StructField("valid_from_ts", T.TimestampType(), True),
    T.StructField("valid_to_ts", T.TimestampType(), True),
    T.StructField("is_current", T.BooleanType(), False),
]


def scd2_table_schema(attr_schema: T.StructType, key: str = "conv_id") -> T.StructType:
    fields = [T.StructField(key, T.StringType(), False)]
    fields += [f for f in attr_schema.fields if f.name != key]
    fields += SCD2_META_FIELDS
    fields += [
        T.StructField(BUCKET_COL, T.IntegerType(), False),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("op_ordinal", T.IntegerType(), True),
    ]
    return T.StructType(fields)


def create_scd2_table(
    spark, path: str, attr_schema: T.StructType, key: str = "conv_id", n_buckets: int = 8
) -> LakeTable:
    return LakeTable.create(
        spark,
        path,
        schema=scd2_table_schema(attr_schema, key),
        partition_by=BUCKET_COL,
        properties={"n_buckets": n_buckets, "scd2_key": key},
    )


def apply_scd2(
    table: LakeTable,
    changes: DataFrame,
    epoch: int,
    source: str = "conv_meta_changes",
    key: str = "conv_id",
    effective_ts: F.Column | None = None,
) -> bool:
    """Apply one change batch to an SCD2 table. Returns False on an
    idempotent skip (epoch already committed).

    ``effective_ts`` is the version-boundary timestamp expression; default
    derives it deterministically from the LSN (FIXTURES.md §3 has no
    commit_ts column), matching the reference using the CDF commit
    timestamp as ``valid_to`` (``silver/cdf_processor.py:301``).
    """
    if table.last_epoch(source) >= epoch:
        return False
    n_buckets = int(table.properties()["n_buckets"])
    target_cols = [f.name for f in table.schema().fields]
    attr_cols = [
        c for c in target_cols
        if c not in {key, "valid_from_ts", "valid_to_ts", "is_current", BUCKET_COL, "lsn", "op_ordinal"}
    ]
    eff = effective_ts if effective_ts is not None else F.timestamp_seconds(
        F.lit(1735689600) + F.col("lsn")
    )

    events = changes.withColumn("_eff_ts", eff)
    # absorb redelivered duplicates: same (key, lsn, op_ordinal) -> one row
    events = events.dropDuplicates([key, "lsn", "op_ordinal"])

    w_seq = Window.partitionBy(key).orderBy("lsn", "op_ordinal")
    events = events.withColumn("_next_ts", F.lead("_eff_ts").over(w_seq))

    # New versions: every I/U event; valid_to = next event's ts (D included
    # in the lead, so a trailing delete closes the last version).
    versions = events.where(F.col("op") != "D").select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col("_eff_ts").alias("valid_from_ts"),
        F.col("_next_ts").alias("valid_to_ts"),
        F.col("_next_ts").isNull().alias("is_current"),
        bucket_expr(key, n_buckets).alias(BUCKET_COL),
        F.col("lsn"),
        F.col("op_ordinal"),
    )

    # Per-key first event time — closes the previously-current version.
    first_ts = events.groupBy(key).agg(F.min("_eff_ts").alias("_close_ts"))
    first_ts = first_ts.withColumn(BUCKET_COL, bucket_expr(key, n_buckets)).persist()
    try:
        affected = [r[BUCKET_COL] for r in first_ts.select(BUCKET_COL).distinct().collect()]
        if not affected:
            table.commit_epoch_noop(source, epoch, {"rows": 0})
            return True
        target_slice = table.read_partitions(affected)
        affected_keys = first_ts.select(key, "_close_ts")
        closed_current = (
            target_slice.where(F.col("is_current"))
            .join(affected_keys, key, "inner")
            .withColumn("valid_to_ts", F.col("_close_ts"))
            .withColumn("is_current", F.lit(False))
            .drop("_close_ts")
        )
        untouched = target_slice.join(affected_keys.select(key), key, "left_anti").unionByName(
            target_slice.where(~F.col("is_current")).join(affected_keys.select(key), key, "left_semi")
        )
        merged = untouched.unionByName(closed_current.select(*target_cols)).unionByName(
            versions.select(*target_cols)
        )
        table.replace_partitions(
            merged,
            summary={"source": source, "operation_kind": "scd2"},
            epoch=(source, epoch),
            partition_values=affected,
        )
        return True
    finally:
        first_ts.unpersist()


def current_view(table: LakeTable) -> DataFrame:
    """The is_current slice — reference's current-records view pattern
    (``silver/table_setup.py:327-343``)."""
    return table.read().where(F.col("is_current"))
