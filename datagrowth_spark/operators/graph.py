"""Connected components over an edge frame — dup-pair → cluster resolution.

Pair-producing dedup operators (exact fingerprints, MinHash/LSH,
SimHash banding, n-gram Jaccard — ``operators/dedup.py``) emit EDGES;
a training-data pipeline needs CLUSTERS: one canonical document kept
per component, the rest dropped. This closes that gap with min-label
propagation expressed entirely in DataFrame ops.

Algorithm: every node starts labeled with itself; each round, every
node takes the min label among itself and its neighbors. After ``d``
rounds (``d`` = component diameter) every node carries the component's
minimum id — the canonical representative. Dedup components are
near-cliques (banding joins all members to a shared bucket), so the
diameter is tiny and convergence takes 1-3 rounds in practice; the loop
stops as soon as a round changes nothing.

Scale notes (100 TB):

* Each round is one join + one groupBy(min) — two shuffles over the
  EDGE set, not the corpus (only documents that appear in some dup
  pair participate). Edge frames from thresholded dedup are a small
  fraction of the corpus.
* Labels are ``localCheckpoint``-ed every round: an iterative loop
  otherwise accumulates lineage and re-executes all prior rounds per
  action.
* For adversarial graphs (long chains — not a dedup shape) the
  round count grows with the diameter; the alternating large-star/
  small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond") converges in O(log d) rounds with the same
  per-round primitives and is the drop-in upgrade if that shape ever
  matters.

No reference counterpart: the reference library has no graph surface;
this is part of the beyond-reference LLM-pipeline layer (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iterations: int = 20) -> DataFrame:
    """Component label per node of an undirected edge frame.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component — deterministic, so the
    output is oracle-checkable and the component id doubles as the
    canonical document choice ("keep the smallest id").
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=False)

    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("component", F.col("node")))
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["node"])
            .select(F.col("v").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node").agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Clusters from dup pairs: ``(doc_id, cluster_id, cluster_size,
    is_canonical)`` for every document that appears in some pair.

    ``cluster_id`` is the smallest doc id in the cluster;
    ``is_canonical`` marks the single document to KEEP — the dedup
    decision a pipeline acts on.
    """
    components = connected_components(pairs, src=src, dst=dst)
    sizes = components.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        components.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )
