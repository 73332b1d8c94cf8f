"""Hot-key skew fixture (FIXTURES.md §5): a few mega-conversations must
not break correctness, and both dedup strategies (partial-agg and salted
two-phase window) agree on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from maritime_activity_reports_cdc_spark.plans import bronze
from maritime_activity_reports_cdc_spark.sources.generator import generate_transcript_changes

from tests.helpers import assert_states_equal, naive_replay, table_state


def test_skewed_replay_correct_under_both_strategies(spark, tmp_path):
    changes = generate_transcript_changes(
        spark,
        n_conversations=50,
        turns_per_conv=6,
        update_ratio=0.5,
        delete_ratio=0.05,
        duplicate_ratio=0.05,
        hot_key_pct=5,
        hot_factor=40,  # hot conversations have 240+ turns vs 6
        seed=23,
    ).cache()
    hot_sizes = changes.groupBy("conv_id").count().agg(F.max("count"), F.min("count")).collect()[0]
    assert hot_sizes[0] > 20 * hot_sizes[1], "fixture must actually be skewed"

    expected = naive_replay(changes)
    for strategy in ("agg", "window"):
        t = bronze.create_transcripts_table(spark, str(tmp_path / strategy), n_buckets=4)
        bronze.replay_change_log(t, changes, n_chunks=3, dedup_strategy=strategy)
        assert_states_equal(table_state(t.read()), expected)
    changes.unpersist()
