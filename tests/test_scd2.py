"""SCD2 apply tests — reference test style 3 (insert-then-update closes the
old version; /root/reference/src/maritime_activity_reports/tests/
test_bronze_layer.py:78-160) plus the cases the reference can't handle:
multi-change batches, deletes, idempotent replay."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maritime_activity_reports_cdc_spark.operators import scd2
from maritime_activity_reports_cdc_spark.sources.generator import (
    CONV_META_CHANGE_SCHEMA,
    generate_conv_meta_changes,
)

ATTRS = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("channel", T.StringType(), True),
        T.StructField("owner", T.StringType(), True),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CONV_META_CHANGE_SCHEMA)


def test_insert_then_update_closes_old_version(spark, tmp_path):
    t = scd2.create_scd2_table(spark, str(tmp_path / "d"), ATTRS, n_buckets=4)
    scd2.apply_scd2(t, _mk(spark, [("I", 1, 0, "c1", "t-v0", "m", "api", "o1")]), epoch=0)
    scd2.apply_scd2(t, _mk(spark, [("U", 2, 0, "c1", "t-v1", "m", "api", "o2")]), epoch=1)
    hist = t.read().orderBy("lsn").collect()
    assert len(hist) == 2
    old, new = hist
    assert old.title == "t-v0" and not old.is_current and old.valid_to_ts is not None
    assert new.title == "t-v1" and new.is_current and new.valid_to_ts is None
    assert old.valid_to_ts == new.valid_from_ts


def test_multi_change_batch_builds_version_chain(spark, tmp_path):
    """G1 fix: I+U+U for one key in ONE batch -> 3 chained versions."""
    t = scd2.create_scd2_table(spark, str(tmp_path / "d"), ATTRS, n_buckets=4)
    batch = _mk(
        spark,
        [
            ("I", 1, 0, "c1", "v0", "m", "api", "o"),
            ("U", 2, 0, "c1", "v1", "m", "api", "o"),
            ("U", 2, 1, "c1", "v2", "m", "api", "o"),
        ],
    )
    scd2.apply_scd2(t, batch, epoch=0)
    hist = t.read().orderBy("lsn", "op_ordinal").collect()
    assert [r.title for r in hist] == ["v0", "v1", "v2"]
    assert [r.is_current for r in hist] == [False, False, True]
    assert hist[0].valid_to_ts == hist[1].valid_from_ts
    assert hist[1].valid_to_ts == hist[2].valid_from_ts


def test_delete_closes_without_new_current(spark, tmp_path):
    t = scd2.create_scd2_table(spark, str(tmp_path / "d"), ATTRS, n_buckets=4)
    scd2.apply_scd2(t, _mk(spark, [("I", 1, 0, "c1", "v0", "m", "api", "o")]), epoch=0)
    scd2.apply_scd2(t, _mk(spark, [("D", 5, 0, "c1", None, None, None, None)]), epoch=1)
    hist = t.read().collect()
    assert len(hist) == 1
    assert not hist[0].is_current and hist[0].valid_to_ts is not None


def test_delete_then_reinsert_in_one_batch(spark, tmp_path):
    t = scd2.create_scd2_table(spark, str(tmp_path / "d"), ATTRS, n_buckets=4)
    scd2.apply_scd2(t, _mk(spark, [("I", 1, 0, "c1", "v0", "m", "api", "o")]), epoch=0)
    batch = _mk(
        spark,
        [
            ("D", 5, 0, "c1", None, None, None, None),
            ("I", 6, 0, "c1", "v1", "m", "web", "o"),
        ],
    )
    scd2.apply_scd2(t, batch, epoch=1)
    cur = scd2.current_view(t).collect()
    assert len(cur) == 1 and cur[0].title == "v1" and cur[0].channel == "web"
    assert t.read().count() == 2  # v0 closed + v1 current


def test_scd2_invariants_on_generated_feed(spark, tmp_path):
    """FIXTURES.md §6: at most one current version per key; closed versions
    have valid_to; chunked apply == single apply; replay is idempotent."""
    feed = generate_conv_meta_changes(spark, n_conversations=60, update_ratio=0.6, delete_ratio=0.05, seed=3).cache()
    t1 = scd2.create_scd2_table(spark, str(tmp_path / "one"), ATTRS, n_buckets=4)
    scd2.apply_scd2(t1, feed, epoch=0)

    t2 = scd2.create_scd2_table(spark, str(tmp_path / "many"), ATTRS, n_buckets=4)
    lo, hi = feed.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    step = (hi - lo) // 3 + 1
    for i in range(3):
        chunk = feed.where((F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step))
        scd2.apply_scd2(t2, chunk, epoch=i)
    # idempotent replay of the last chunk
    assert scd2.apply_scd2(t2, feed, epoch=2) is False

    for t in (t1, t2):
        cur = scd2.current_view(t).groupBy("conv_id").count()
        assert cur.where(F.col("count") > 1).count() == 0
        closed = t.read().where(~F.col("is_current"))
        assert closed.where(F.col("valid_to_ts").isNull()).count() == 0

    cols = ["conv_id", "title", "model", "channel", "owner", "is_current", "lsn", "op_ordinal"]
    a = t1.read().select(cols).toPandas().sort_values(["conv_id", "lsn", "op_ordinal"]).reset_index(drop=True)
    b = t2.read().select(cols).toPandas().sort_values(["conv_id", "lsn", "op_ordinal"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    feed.unpersist()
