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
  min-label round count grows with the diameter; the alternating
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", 2014 — public paper) converges
  in O(log d) rounds with the same per-round primitives. Implemented
  below (``_star_components``); the default ``algorithm="auto"`` runs
  min-label for a few rounds (optimal for the near-clique graphs
  thresholded dedup emits) and, if still unconverged, contracts the
  graph through the partial labels and finishes with star rounds —
  so chain-shaped dup graphs cost O(log d) total instead of O(d).

No reference counterpart: the reference library has no graph surface;
this is part of the beyond-reference LLM-pipeline layer (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. §3): every node connects its
    strictly-larger neighbors to the minimum of its closed neighborhood.
    Input/output: undirected edge pair set ``(u, v)``, no self-loops."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects its smaller-or-equal
    neighbors (and itself) to the minimum of that set."""
    directed = (
        edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = directed.join(mins, "u").select(F.col("v").alias("node"), F.col("m"))
    centers = mins.select(F.col("u").alias("node"), F.col("m"))
    return (
        nbrs.unionByName(centers)
        .where(F.col("node") != F.col("m"))
        .select(F.col("node").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _star_components(pairs: DataFrame, max_iterations: int = 25) -> tuple[DataFrame, int]:
    """Large-star/small-star fixed point → ``(labels, rounds)``.

    ``labels`` is ``(node, component)`` for every node of ``pairs``
    (component = minimum id, same contract as min-label propagation);
    ``rounds`` is the number of large+small iterations executed —
    O(log d) by the paper's potential argument, surfaced so tests can
    pin the bound. Each round is two joins + two aggregations over the
    edge set, checkpointed so lineage stays flat."""
    nodes = (pairs.select(F.col("u").alias("node"))
             .union(pairs.select(F.col("v").alias("node"))).distinct())
    edges = (pairs.where(F.col("u") != F.col("v")).distinct()
             .localCheckpoint(eager=True))
    prev_fp = None
    rounds = 0
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        rounds += 1
        # Cheap convergence fingerprint: the fixed point is reached when
        # the edge set stops changing (count + order-free xor-hash;
        # xor never overflows under ANSI and edges are distinct).
        row = edges.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        fp = (row["c"], row["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    # At the fixed point the edge set is a star per component, centered
    # at the component minimum.
    star = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(edges.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .groupBy("node").agg(F.min("component").alias("component"))
    )
    labels = (
        nodes.join(star, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )
    return labels, rounds


def _driver_components(spark, rows, u_type) -> DataFrame:
    """Union-find over a collected edge list — the local solve for
    graphs below the distributed threshold."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r["u"], r["v"]
        for n in (u, v):
            if n not in parent:
                parent[n] = n
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for n in parent:
        root = find(n)
        cur = comp_min.get(root)
        if cur is None or n < cur:
            comp_min[root] = n
    out = [(n, comp_min[find(n)]) for n in parent]
    schema = T.StructType([T.StructField("node", u_type),
                           T.StructField("component", u_type)])
    return spark.createDataFrame(out, schema)


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iterations: int = 20, algorithm: str = "auto",
                         min_label_rounds: int = 4,
                         driver_threshold: int = 100_000) -> DataFrame:
    """Component label per node of an undirected edge frame.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component — deterministic, so the
    output is oracle-checkable and the component id doubles as the
    canonical document choice ("keep the smallest id").

    ``algorithm``:

    * ``"min_label"`` — pure min-label propagation, O(d) rounds; best
      when components are near-cliques (thresholded dedup output).
    * ``"star"`` — large-star/small-star, O(log d) rounds; best for
      high-diameter graphs (chains of borderline near-dups).
    * ``"auto"`` (default) — min-label for ``min_label_rounds`` rounds,
      then, if unconverged, contract the graph through the partial
      labels (component-preserving, usually a huge shrink) and finish
      with star rounds. Worst case stays O(log d).

    ``driver_threshold``: edge sets at or below this size are solved
    with a driver-side union-find instead of iterative rounds — the
    standard hybrid: a thresholded dup graph is usually a tiny fraction
    of the corpus, and a local solve replaces N driver-coordinated
    rounds (each several jobs) with one collect. 100k edges is a few MB
    on the driver; identical output by construction (min id per
    component). Pass 0 to force the distributed path.
    """
    pairs = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if algorithm == "star":
        labels, _ = _star_components(pairs, max_iterations=max_iterations)
        return labels

    if driver_threshold:
        # limit(threshold+1) caps the collect: if the graph is over the
        # bound we learn that from ONE extra row, never by pulling the
        # full edge set to the driver.
        head = pairs.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _driver_components(
                pairs.sparkSession, head, pairs.schema["u"].dataType)

    sym = pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=False)

    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("component", F.col("node")))
    budget = max_iterations if algorithm == "min_label" else min(min_label_rounds, max_iterations)
    converged = False
    for _ in range(budget):
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
            converged = True
            break
    if converged or algorithm == "min_label":
        return labels

    # Unconverged near the round budget — the graph has real diameter.
    # Contract edges through the partial labels (nodes sharing a label
    # are provably connected) and resolve the contracted graph with
    # star rounds; compose the two label maps.
    lab_u = labels.select(F.col("node").alias("u"), F.col("component").alias("cu"))
    lab_v = labels.select(F.col("node").alias("v"), F.col("component").alias("cv"))
    contracted = (
        sym.join(lab_u, "u").join(lab_v, "v")
        .select(F.col("cu").alias("u"), F.col("cv").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    star_labels, _ = _star_components(contracted, max_iterations=max_iterations)
    return (
        labels.join(
            star_labels.select(F.col("node").alias("component"),
                               F.col("component").alias("__final")),
            "component", "left")
        .select("node", F.coalesce("__final", F.col("component")).alias("component"))
    )


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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge frame — the
    link-graph quality-propagation signal CommonCrawl-style curation
    uses to score domains/documents (harmonic/centrality family).

    Returns ``(node, rank)`` for every node appearing as a source or
    destination, after exactly ``iterations`` power-iteration steps
    from the uniform vector — fixed iterations (not convergence-gated)
    so the result is deterministic and oracle-checkable by unrolling
    the same steps in SQL.

    Semantics: standard damped PageRank with dangling-mass
    redistribution — each step,
    ``rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/out(u) + dangling/N)``
    where ``dangling`` is the total rank sitting on nodes with no
    out-edges.

    Scale shape: each iteration is one join (edges ⋈ ranks on src —
    both sides hash-partitioned on the node id, so successive
    iterations reuse the same partitioning) + one groupBy(dst) sum over
    the EDGE set, plus a one-row dangling aggregate broadcast into the
    next step. Ranks are ``localCheckpoint``-ed per iteration, exactly
    like the component loop above: bounded lineage, no re-execution of
    prior rounds. Per-iteration cost is O(|E|) shuffle — the Pregel
    cost model — and the iteration count is a caller-fixed constant.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")) \
        .localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("out")) \
        .localCheckpoint(eager=False)

    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        # ONE materialization per round: the (rank, out) join is the
        # frame both the dangling aggregate and the contribution join
        # consume — checkpointing it here (instead of raw ranks at the
        # end) halves the per-round passes and keeps lineage depth 1.
        with_deg = ranks.join(out_deg, "node", "left").localCheckpoint(eager=True)
        dangling = (
            with_deg.where(F.col("out").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .collect()[0]["d"]
        )
        contribs = (
            e.join(with_deg.where(F.col("out").isNotNull()),
                   e["u"] == F.col("node"))
            .select(F.col("v").alias("node"),
                    (F.col("rank") / F.col("out")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.lit(dangling / n_nodes))).alias("rank"),
            )
        )
    return ranks
