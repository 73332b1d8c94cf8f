"""Keyword and hybrid retrieval operators for corpus search.

The dedup/ANN families answer "which documents are alike"; retrieval
answers "which documents match this query" — the primitive behind RAG
context fetch, eval-set mining, and corpus exploration at pretraining
scale:

- **term index** (`term_table`): (doc, term, tf) postings — the
  shuffle-once base relation every keyword scorer shares.
- **BM25** (`bm25_scores` / `bm25_topk`): Okapi BM25 with the Lucene
  ``ln(1 + (N - df + .5)/(df + .5))`` idf (always positive). Corpus
  statistics (doc length, avgdl, df) come from the corpus itself;
  query terms are broadcast.
- **reciprocal rank fusion** (`rrf_fuse`): the standard hybrid-search
  combiner (Cormack et al., SIGIR'09) — fuses two rankings by
  ``sum 1/(k0 + rank)`` without requiring comparable scores, which is
  exactly why it is the default way to merge BM25 with dense-ANN
  results.

All pure DataFrame column algebra (no UDFs, no RDDs), deterministic and
ANSI-SQL-reproducible for the DuckDB oracle: per-term BM25 weights are
rounded to 7 dp and summed as DECIMAL(20,7) — an order-independent exact
sum, so the score (and therefore the ranking) is bit-stable across
partitionings, runs, and engines.

Scale notes (100 TB):
- `term_table` is one explode + one map-side-combinable groupBy; at
  corpus scale it IS the inverted-index build and would be persisted
  (bucketed by term) rather than recomputed per query batch.
- `bm25_scores` reduces the corpus side FIRST: postings are semi-joined
  to the broadcast query-term set before any corpus-wide shuffle, so
  cost is O(postings of query terms), not O(all postings). Document
  lengths and ``avgdl`` are corpus constants — computed once here, and
  in a production index precomputed alongside the postings.
- `rrf_fuse` joins two already-top-k frames: O(queries x k) rows, a
  broadcast-sized relation by construction.

Reference provenance: the reference pipeline has no retrieval layer
(gold/activity_reports.py stops at per-entity rollups); this family
extends the engine for the RAG/eval-mining workloads named in
SURVEY.md §6 alongside the dedup and ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from maritime_activity_reports_cdc_spark.operators.dedup import normalize_text

# BM25 free parameters (Robertson's recommended defaults, also Lucene's).
BM25_K1 = 1.2
BM25_B = 0.75
# Per-term weights are rounded to this scale and summed exactly as
# DECIMAL so the aggregate is order-independent (double summation is
# not associative; a 7-dp decimal sum is) and engine-reproducible.
BM25_SCALE = 7
RRF_K0 = 60  # the k constant from the RRF paper; 60 is the published default


def term_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings with term frequency: one row per (document, distinct
    term) as ``(_id, _t, tf)``.

    One explode + one groupBy with map-side partial counts — the same
    normalize/split pipeline as ``shingle_table`` so keyword search and
    dedup agree on tokenization."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("_t"),
    )
    return toks.groupBy("_id", "_t").agg(F.count("*").alias("tf"))


def _bm25_weight(tf, dfreq, n_docs, dl, avgdl, k1: float, b: float):
    """Per-(term, doc) BM25 weight, written in the exact operation order
    the SQL twin uses so both engines produce identical doubles."""
    idf = F.log(1.0 + (n_docs - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)))
    norm = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    return idf * (tf * F.lit(k1 + 1.0)) / norm


def bm25_scores(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k1: float = BM25_K1,
    b: float = BM25_B,
    postings: DataFrame | None = None,
) -> DataFrame:
    """BM25 relevance of every matching document to every query:
    ``(query_id, doc_id, score)``, score > 0 rows only (documents
    sharing at least one term with the query).

    Plan shape: corpus postings + doc-length stats (one pass), then the
    postings are cut down to query terms via a BROADCAST semi-join
    before anything query-dependent shuffles — the corpus-sized side
    crosses the wire once, reduced to O(postings of query terms).
    ``n_docs``/``avgdl`` ride along as a broadcast 1-row frame.

    The inline path derives postings from ``corpus`` per call — Catalyst
    builds that subtree once per consumer (dfreq / doc lengths /
    matching), i.e. several corpus scans. Fine for one-shot queries; a
    production index passes ``postings`` (the persisted/bucketed output
    of ``term_table``, the actual inverted-index layout) and the corpus
    is never re-tokenized."""
    tt = postings if postings is not None else term_table(corpus, id_col, text_col)
    doclens = tt.groupBy("_id").agg(F.sum("tf").alias("dl"))
    stats = doclens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    qt = (
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.explode(F.split(normalize_text(query_text_col), " ")).alias("_t"),
        )
        .distinct()
    )
    terms = qt.select("_t").distinct()
    dfreq = (
        tt.join(F.broadcast(terms), "_t")
        .groupBy("_t")
        .agg(F.count("*").alias("dfreq"))
    )

    matched = (
        tt.join(F.broadcast(qt), "_t")
        .join(F.broadcast(dfreq), "_t")
        .join(doclens, "_id")
        .crossJoin(F.broadcast(stats))
    )
    w = _bm25_weight(
        F.col("tf"), F.col("dfreq"), F.col("n_docs"),
        F.col("dl"), F.col("avgdl"), k1, b,
    )
    return (
        matched.withColumn(
            "_w", F.round(w, BM25_SCALE).cast(f"decimal(20,{BM25_SCALE})")
        )
        .groupBy("_qid", "_id")
        .agg(F.sum("_w").cast("double").alias("score"))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "score",
        )
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k1: float = BM25_K1,
    b: float = BM25_B,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25:
    ``(query_id, doc_id, rk, score)``. Rank is deterministic: the score
    is an exact decimal sum, ties break by document id."""
    scored = bm25_scores(
        corpus, queries, id_col, text_col, query_id_col, query_text_col,
        k1, b, postings,
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), id_col)
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select(query_id_col, id_col, "rk", "score")
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    k0: int = RRF_K0,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Reciprocal rank fusion of two rankings (each
    ``(query_id, id, rank)``): fused score
    ``1/(k0 + rank_a) + 1/(k0 + rank_b)`` with an absent list
    contributing 0 — rank-only fusion, so BM25 and cosine scores never
    need calibrating against each other. Returns the fused top-``k``
    as ``(query_id, doc_id, rrf, rk)``.

    Both inputs are top-k frames (O(queries x k) rows); the outer join
    and re-rank are broadcast-scale by construction."""
    fa = a.select(
        F.col(query_id_col).alias("_qid"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).alias("_ra"),
    )
    fb = b.select(
        F.col(query_id_col).alias("_qid"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).alias("_rb"),
    )
    fused = fa.join(fb, ["_qid", "_id"], "full_outer").withColumn(
        "rrf",
        F.round(
            F.coalesce(1.0 / (F.lit(k0) + F.col("_ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k0) + F.col("_rb")), F.lit(0.0)),
            6,
        ),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("rrf"), "_id")
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "rrf",
            "rk",
        )
    )
