"""Language-model-based corpus scoring for training-data pipelines.

Two standard data-quality signals that complement the heuristic scores
in ``functions/text.py``:

- **unigram negative-log-likelihood** (`unigram_nll_scores`): the
  CCNet-style quality filter — score each document by its per-token
  NLL under a unigram LM estimated from a reference corpus, then keep
  the head of the distribution. (CCNet uses a 5-gram KenLM over
  Wikipedia; the unigram model is the same shape of computation — a
  token-level log-prob lookup and an exact aggregated sum — expressed
  as pure column algebra so it runs JVM-side and reproduces in ANSI
  SQL. Swapping in externally-trained n-gram tables is a broadcast-dim
  replacement, not an architecture change.)
- **hashed n-gram importance weights** (`importance_weights`): DSIR
  (Xie et al., 2023) — weight every raw document by
  ``sum log(p_target(bucket) / p_raw(bucket))`` over hashed token
  buckets, where the two bucket distributions are estimated from a
  target (high-quality) corpus and the raw corpus. The standard way to
  pick "looks like Wikipedia" slices out of a crawl without training a
  classifier.

Determinism / oracle discipline (a stricter variant of the BM25 DECIMAL
sums in ``retrieval.py``): per-token log costs are scaled by 1e7 and
rounded to BIGINT, then summed as exact integers — order-independent
across partitionings and engines. The reported per-token score divides
the exact integer sum by the exact token count in double precision
WITHOUT a final decimal rounding: identical integer inputs through
correctly-rounded IEEE ops give bit-identical doubles on every engine,
whereas rounding a quotient of a 7-dp sum by a small integer count
lands exactly on the x.xxxxxx5 half boundary whenever the count
divides the sum's last digit — where HALF_UP (Spark) and HALF_EVEN
disagree systematically (observed on ~1% of documents).

Scale notes (100 TB):
- The unigram vocabulary and the DSIR bucket tables are corpus
  *statistics* — millions of rows at most (and the bucket table is
  capped at ``n_buckets`` by construction). Both are built with one
  map-side-combinable groupBy over the reference corpus and then
  BROADCAST to the raw-corpus scoring join: the big side never
  shuffles for the lookup, only for its own per-doc partial aggregate.
- Scoring reuses the ``term_table`` postings shape (explode + tf
  groupBy): one shuffle on (doc, token), partial-agg combined. At
  production scale the postings/vocab would be persisted once and
  reused across scoring runs (same argument as the BM25 inverted
  index).
- Totals (token count, vocab size) ride along as broadcast 1-row
  frames — no driver-side collect in the plan.

Reference provenance: the reference pipeline has no LM-scoring layer
(silver/cdf_processor.py:140-211 stops at per-row heuristic flags);
this family extends the engine for the corpus-quality workloads named
in SURVEY.md §6 alongside the curation and retrieval families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maritime_activity_reports_cdc_spark.operators.dedup import _hasher
from maritime_activity_reports_cdc_spark.operators.retrieval import term_table

# Per-token log costs are scaled by 10^LM_SCALE, rounded to BIGINT and
# summed exactly (order-independent; double summation is not
# associative). 1e7 keeps a 100-trillion-token corpus sum under 2^63.
LM_SCALE = 7
_E7 = 10_000_000


def unigram_nll_scores(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram NLL under a Laplace-smoothed LM estimated
    from ``reference`` (default: the corpus itself — self-perplexity,
    which already separates repetitive/degenerate documents from
    typical ones; CCNet passes a Wikipedia-trained model instead).

    Returns ``(doc_id, n_tokens, nll_per_token)`` where
    ``p(w) = (count(w) + 1) / (T + V)`` over the reference corpus
    (``T`` reference token occurrences, ``V`` distinct reference
    tokens; unseen tokens get ``count = 0``) and ``nll_per_token``
    is the exact integer sum of 1e7-scaled per-occurrence costs
    ``-ln p(w)`` divided by ``n_tokens * 1e7`` in doubles (no final
    rounding — see the module determinism note). Lower = closer to
    the reference distribution.

    Plan: reference vocab = one groupBy (map-side combined) broadcast
    to the corpus postings; corpus side shuffles once for its own
    per-doc tf aggregate. No UDFs, no driver actions.
    """
    ref_tt = term_table(reference if reference is not None else corpus,
                        id_col, text_col)
    vocab = ref_tt.groupBy("_t").agg(F.sum("tf").alias("_c"))
    stats = vocab.agg(
        F.sum("_c").alias("_tot"), F.count("*").alias("_vsz")
    )

    doc_tt = term_table(corpus, id_col, text_col)
    scored = (
        doc_tt.join(F.broadcast(vocab), "_t", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "_id", "tf",
            # -ln((c+1)/(T+V)) with c = 0 for OOV; written in the exact
            # operation order the SQL twin uses (int + 1 -> double
            # division -> ln -> negate -> scale -> round to BIGINT).
            F.round(
                -F.log(
                    (F.coalesce(F.col("_c"), F.lit(0)) + F.lit(1))
                    / (F.col("_tot") + F.col("_vsz"))
                )
                * F.lit(float(_E7))
            ).cast("long").alias("_cost"),
        )
    )
    return (
        scored.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("_cost")).cast("long").alias("_nll"),
        )
        .select(
            id_col, "n_tokens",
            (
                F.col("_nll").cast("double")
                / (F.col("n_tokens").cast("double") * F.lit(float(_E7)))
            ).alias("nll_per_token"),
        )
    )


def hashed_bucket_counts(
    df: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Token-occurrence counts per hash bucket: ``(bucket, cnt)``.
    The DSIR feature distribution for one corpus — at most
    ``n_buckets`` rows regardless of corpus size."""
    H = _hasher(hash_fn)
    tt = term_table(df, id_col, text_col)
    return (
        tt.select(F.pmod(H(F.col("_t")), F.lit(n_buckets)).alias("bucket"), "tf")
        .groupBy("bucket")
        .agg(F.sum("tf").alias("cnt"))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR hashed-n-gram importance weight for every raw document:
    ``(doc_id, n_tokens, log_ratio)`` with

        log_ratio = sum over token occurrences of
                    ln( p_target(bucket) / p_raw(bucket) )

    under Laplace-smoothed bucket distributions
    ``p(b) = (cnt(b) + 1) / (T + n_buckets)`` estimated independently
    from the target and raw corpora. Positive = looks more like the
    target than like the raw corpus; sampling raw docs with
    probability proportional to ``exp(log_ratio)`` (or keeping the
    top slice) is the DSIR selection rule.

    Each per-occurrence log-ratio is computed as ONE ``ln`` of the
    probability ratio, scaled by 1e7 and rounded to BIGINT, then
    summed exactly (multiplied by the integer tf), so the score is
    order-independent and engine-reproducible (``hash_fn='md5_48'``
    for oracles); the reported ``log_ratio`` divides the integer sum
    by 1e7 in doubles with no further rounding.

    Plan: two bounded bucket tables (≤ n_buckets rows each, broadcast)
    joined to the raw postings; the raw corpus shuffles once for its
    per-doc aggregate. Raw-side buckets always exist (the doc is part
    of the raw estimate); target-side misses coalesce to count 0.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    H = _hasher(hash_fn)

    t_counts = hashed_bucket_counts(target, n_buckets, text_col, id_col, hash_fn)
    t_stats = t_counts.agg(F.sum("cnt").alias("_tott"))
    r_counts = hashed_bucket_counts(raw, n_buckets, text_col, id_col, hash_fn)
    r_stats = r_counts.agg(F.sum("cnt").alias("_totr"))

    tt = term_table(raw, id_col, text_col)
    per_bucket = (
        tt.select(
            "_id", "tf",
            F.pmod(H(F.col("_t")), F.lit(n_buckets)).alias("bucket"),
        )
        .join(F.broadcast(t_counts.withColumnRenamed("cnt", "_ct")), "bucket", "left")
        .join(F.broadcast(r_counts.withColumnRenamed("cnt", "_cr")), "bucket", "left")
        .crossJoin(F.broadcast(t_stats))
        .crossJoin(F.broadcast(r_stats))
        .select(
            "_id", "tf",
            F.round(
                F.log(
                    ((F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1))
                     / (F.col("_tott") + F.lit(n_buckets)))
                    / ((F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(1))
                       / (F.col("_totr") + F.lit(n_buckets)))
                )
                * F.lit(float(_E7))
            ).cast("long").alias("_lr"),
        )
    )
    return (
        per_bucket.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("_lr")).cast("long").alias("_sum"),
        )
        .select(
            id_col, "n_tokens",
            (F.col("_sum").cast("double") / F.lit(float(_E7))).alias("log_ratio"),
        )
    )
