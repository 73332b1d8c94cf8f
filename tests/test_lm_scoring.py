"""Ground-truth + plan tests for the LM-scoring family
(``operators/lm.py``) and the round-4 curation extensions
(segment dedup, badwords, temperature weights)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from maritime_activity_reports_cdc_spark.operators import curation as CU
from maritime_activity_reports_cdc_spark.operators import lm as LM


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma alpha"),
        (1, "alpha beta"),
        (2, "delta delta delta delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_nll(doc_tokens, counts, T, V):
    costs = [
        round(-math.log((counts.get(w, 0) + 1) / (T + V)) * 1e7) for w in doc_tokens
    ]
    s = sum(costs)
    return s / (len(doc_tokens) * 1e7)


def test_unigram_nll_hand_computed(spark, corpus):
    # corpus stats: alpha=3 beta=2 gamma=1 delta=4 -> T=10, V=4
    counts = {"alpha": 3, "beta": 2, "gamma": 1, "delta": 4}
    out = {r.doc_id: r for r in LM.unigram_nll_scores(corpus).collect()}
    assert out[0].n_tokens == 4 and out[1].n_tokens == 2 and out[2].n_tokens == 4
    for doc_id, toks in [
        (0, ["alpha", "beta", "gamma", "alpha"]),
        (1, ["alpha", "beta"]),
        (2, ["delta", "delta", "delta", "delta"]),
    ]:
        assert out[doc_id].nll_per_token == pytest.approx(
            _expected_nll(toks, counts, 10, 4), abs=1e-9
        )
    # the repeated common token scores lower (more typical) than the
    # doc containing the rare token
    assert out[2].nll_per_token < out[0].nll_per_token


def test_unigram_nll_external_reference_and_oov(spark, corpus):
    ref = spark.createDataFrame([(100, "alpha alpha beta")], "doc_id long, text string")
    # ref stats: alpha=2 beta=1 -> T=3, V=2; gamma/delta are OOV (c=0)
    counts = {"alpha": 2, "beta": 1}
    out = {r.doc_id: r for r in LM.unigram_nll_scores(corpus, reference=ref).collect()}
    exp2 = _expected_nll(["delta"] * 4, counts, 3, 2)
    assert out[2].nll_per_token == pytest.approx(exp2, abs=1e-9)
    # all-OOV doc must score strictly worse than in-vocab docs
    assert out[2].nll_per_token > out[1].nll_per_token


def test_dsir_importance_separates_target_like_docs(spark):
    rows = (
        [(i, "wiki facts science knowledge article") for i in range(5)]
        + [(10 + i, "spam click buy cheap now") for i in range(5)]
        + [(20, "wiki facts science knowledge article"), (21, "spam click buy cheap now")]
    )
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.where(F.col("doc_id") < 5)  # the 'high-quality' slice
    out = {r.doc_id: r.log_ratio for r in LM.importance_weights(raw, target, n_buckets=64).collect()}
    # target-like doc scores strictly above crawl-like doc
    assert out[20] > 0 > out[21]
    # identical text -> identical weight (pure function of content)
    assert out[20] == out[0] and out[21] == out[10]


def test_dsir_bucket_table_is_bounded(spark):
    raw = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(200)],
        "doc_id long, text string",
    )
    counts = LM.hashed_bucket_counts(raw, n_buckets=16)
    assert counts.count() <= 16
    assert counts.agg(F.sum("cnt")).first()[0] == 600  # every occurrence counted


def test_segment_dedup_keeps_first_occurrence_and_reassembles(spark):
    seg = "a b c d"  # seg_words=4 -> one full segment
    rows = [
        (0, f"{seg} unique zero text here"),
        (1, f"{seg} other one body words"),  # loses the shared segment
        (2, "totally fresh content four"),  # untouched
        (3, seg),  # pure boilerplate -> dropped entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in CU.segment_dedup(df, seg_words=4).collect()}
    assert out[0].clean_text == f"{seg} unique zero text here"
    assert out[0].n_segs_kept == 2 and out[0].n_segs_total == 2
    assert out[1].clean_text == "other one body words"
    assert out[1].n_segs_kept == 1 and out[1].n_segs_total == 2
    assert out[2].n_segs_kept == 1
    assert 3 not in out  # C4 drop rule: no surviving segments


def test_segment_dedup_partial_tail_segments_differ(spark):
    # same words, different alignment -> tail segments are distinct spans
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d f")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in CU.segment_dedup(df, seg_words=4).collect()}
    # shared full segment 'a b c d' deduped; distinct tails both survive
    assert out[0].clean_text == "a b c d e"
    assert out[1].clean_text == "f"


def test_badword_fraction_hand_computed_and_boundary(spark):
    df = spark.createDataFrame(
        [
            (0, "good good bad good"),  # 1/4 = 0.25
            (1, "clean text only here"),  # 0
            (2, " ".join(["bad"] + ["ok"] * 127)),  # 1/128: the HALF boundary
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in CU.badword_stats(df, ["bad"], max_bad_frac=0.1).collect()}
    assert out[0].bad_frac == 0.25 and not out[0].keep
    assert out[1].bad_frac == 0.0 and out[1].keep
    # 1/128 = 0.0078125 -> half-up at 6 dp = 0.007813 exactly
    assert out[2].bad_frac == 0.007813 and out[2].keep


def test_temperature_weights_sum_to_one_and_flatten(spark):
    df = spark.createDataFrame(
        [(i, "s_big" if i < 90 else "s_small") for i in range(100)],
        "doc_id long, source string",
    )
    flat = {r.source: r.weight for r in CU.temperature_weights(df, alpha=0.3).collect()}
    sharp = {r.source: r.weight for r in CU.temperature_weights(df, alpha=1.0).collect()}
    assert sum(flat.values()) == pytest.approx(1.0, abs=2e-6)
    # alpha=1 reproduces raw proportions; alpha<1 boosts the tail
    assert sharp["s_big"] == pytest.approx(0.9, abs=1e-6)
    assert flat["s_small"] > sharp["s_small"]


def test_lm_scoring_plans_broadcast_the_stats_side(spark):
    import contextlib

    from tests.test_plans_curation import _no_aqe, _plan

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} alpha beta") for i in range(64)], "doc_id long, text string"
    )
    with _no_aqe(spark):
        for df in (
            LM.unigram_nll_scores(docs),
            LM.importance_weights(docs, docs.where(F.col("doc_id") < 8), n_buckets=32),
        ):
            plan = _plan(df)
            # vocab/bucket lookups ride as broadcast joins; the corpus
            # side never shuffles for the dictionary lookup
            assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
            assert "SortMergeJoin" not in plan
            assert "CartesianProduct" not in plan
