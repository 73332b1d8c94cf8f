"""Distributed graph clustering for corpus deduplication.

Pairwise near-duplicate candidates (minhash-LSH, embedding bands) are
only half of dedup at scale: A~B and B~C must collapse into ONE cluster
even when A~C was never emitted as a pair, i.e. the keep-set is one
canonical document per CONNECTED COMPONENT of the similarity graph
(the transitive-closure semantics used by large public corpus builds —
e.g. the near-dedup stage described in "Deduplicating Training Data
Makes Language Models Better", Lee et al. 2022).

`connected_components` is iterative min-label propagation expressed as
pure DataFrame algebra: each round every node takes the minimum label
among itself and its neighbours — one shuffle join + one partial-agg
groupBy per round, converging in O(graph diameter) rounds. Duplicate
clusters are near-cliques (diameter 1-2 from a shared LSH bucket,
occasionally chained a few hops by drifting shingles), so the loop is
3-4 rounds in practice; `max_iter` guards pathological chains. For
adversarial long-path graphs at 100 TB, the published fix is the
star-contraction family (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) which bounds rounds at O(log n) —
the per-round plan below is unchanged, only the edge rewrite differs.

Scale notes:
- Labels are localCheckpoint'ed each round: truncates the O(iter)-deep
  lineage AND stops Spark re-running the whole prefix chain per action.
- Convergence is detected from ONE driver-side scalar per round
  (sum of labels): min-label propagation is pointwise monotone
  non-increasing, so an unchanged sum IS convergence — no second
  join-and-compare shuffle.
- The edge frame is reused every round; callers passing a computed pair
  frame (an LSH self-join) should persist it, as the query wrappers do.

No counterpart in the reference repo (its dedup is single-key
dropDuplicates, bronze/cdc_ingestion.py:131-140); semantics follow the
public corpus-dedup literature instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph.

    ``nodes``: one row per node (``id_col``); isolated nodes become
    singleton components. ``edges``: pair rows (``src_col``,
    ``dst_col``) in either orientation — symmetrised internally.
    Returns ``(id, component)`` where ``component`` is the MINIMUM node
    id in the component (deterministic, engine-independent — and
    exactly what a recursive-CTE oracle computes).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence (graph diameter exceeds the guard)."""
    spark = nodes.sparkSession
    ids = nodes.select(F.col(id_col).cast("long").alias("id")).distinct()
    sym = (
        edges.select(
            F.col(src_col).cast("long").alias("s"),
            F.col(dst_col).cast("long").alias("d"),
        )
        .union(
            edges.select(
                F.col(dst_col).cast("long").alias("s"),
                F.col(src_col).cast("long").alias("d"),
            )
        )
        # self-loops keep every node (and its own current label) present
        # in the propagation join, so no separate join-back is needed
        .union(ids.select(F.col("id").alias("s"), F.col("id").alias("d")))
        .distinct()
    )
    sym.persist()
    labels = ids.select("id", F.col("id").alias("component")).localCheckpoint()
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    try:
        if prev_sum is None:  # empty graph
            return labels
        for _ in range(max_iter):
            new_labels = (
                sym.join(labels, sym["d"] == labels["id"])
                .groupBy(F.col("s").alias("id"))
                .agg(F.min("component").alias("component"))
                .localCheckpoint()
            )
            new_sum = new_labels.agg(F.sum("component")).collect()[0][0]
            labels = new_labels
            # labels only ever decrease -> equal sum == fixed point
            if new_sum == prev_sum:
                return labels
            prev_sum = new_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "graph diameter exceeds the guard (raise max_iter, or switch "
            "to star-contraction for adversarial long-path graphs)"
        )
    finally:
        sym.unpersist()


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Transitive near-duplicate clustering: fold a pairwise candidate
    frame (minhash-LSH / embedding bands) into connected components and
    elect the minimum doc id of each cluster canonical — the keep-set
    of a corpus-level near-dedup pass. Returns one row per document:
    ``(doc_id, cluster_id, cluster_size, is_canonical)``; documents
    with no near-duplicate form singleton clusters of themselves."""
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col=pair_a, dst_col=pair_b
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
    )
