"""Connected components over candidate-duplicate pairs (graph clustering).

A real dedup pipeline does not stop at pairs: MinHash/SimHash/Jaccard emit
*edges* (id_a, id_b), and the keep/drop decision needs the transitive
closure — if A~B and B~C, all three are one cluster even though (A,C) was
never emitted. This module closes that gap: ``connected_components`` turns
an edge list into (node, component) labels where the component id is the
minimum node id in the component, and ``dedup_clusters`` composes it with
any pair generator from ``operators.dedup``.

Scale notes (100 TB / 10^12 nodes): the algorithm is min-label propagation
with pointer jumping — each round (a) pulls the min label across each
node's neighborhood (one shuffle on the edge list) and (b) replaces every
label with its label's label (one shuffle on the label table, which is
|nodes| rows of two longs). Pointer jumping gives O(log n) rounds on path
graphs instead of O(n) for plain propagation; dedup graphs (stars/cliques
around a popular document) typically converge in 2-3 rounds. Nothing is
ever collected to the driver; per-round lineage is truncated with
``localCheckpoint`` so the plan does not grow with the iteration count
(the standard Spark iterative-algorithm pattern). The edge list is
re-used every round — it is cached once, symmetrized.

No reference parity: thomersch/grandine has no graph operator; this is a
BASELINE.md training-data-pipeline extension (axes: pyspark x webtext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node that appears in ``edges``; the
    component label is the minimum node id reachable from the node.

    Deterministic: output depends only on the edge *set* (duplicates and
    orientation are normalized away). Raises after ``max_iter`` rounds
    rather than silently returning partial labels — with pointer jumping,
    25 rounds covers any graph a dedup pipeline can produce (2^25-long
    induced paths).
    """
    sym = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    sym = (
        sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = sym.persist()
    try:
        # init: every node labels itself
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_iter):
            # (a) neighborhood pull: lbl'(u) = min(lbl(u), min_{v~u} lbl(v))
            nbr = (
                sym.join(labels.select(F.col("node").alias("b"), F.col("lbl").alias("nlbl")), "b")
                .groupBy("a")
                .agg(F.min("nlbl").alias("nmin"))
                .withColumnRenamed("a", "node")
            )
            pulled = (
                labels.join(nbr, "node", "left")
                .select("node", F.least("lbl", F.coalesce("nmin", "lbl")).alias("lbl"))
            )
            # (b) pointer jump: lbl''(u) = lbl(lbl'(u)) — label table joined
            # to itself (|nodes| rows, two longs: cheap even at 10^12)
            jumped = (
                pulled.join(
                    pulled.select(F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")),
                    "lbl",
                )
                .select("node", F.col("lbl2").alias("lbl"))
                .localCheckpoint(eager=True)
            )
            changed = (
                jumped.join(labels.withColumnRenamed("lbl", "old"), "node")
                .filter(F.col("lbl") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = jumped
            if changed == 0:
                return labels.select(F.col("node"), F.col("lbl").alias("component"))
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        sym.unpersist()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for every document: (doc_id, cluster_id, is_keeper).

    Documents that appear in no pair are their own singleton cluster. The
    keeper is the minimum doc_id of the cluster (same convention as
    ``dedup_exact``), so ``filter(is_keeper)`` is the deduplicated corpus.
    One extra left join against the (small) label table; the docs table is
    never shuffled on anything but the join key.
    """
    comp = connected_components(pairs, id_a, id_b)
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col("doc_id") == F.col("cluster_id"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a link graph (url/domain graph analytics): (node,
    rank) after ``n_iter`` power iterations with dangling-mass
    redistribution — rank mass of nodes with no out-links is spread
    uniformly each round, so ranks stay a probability distribution.

    Scale shape (10^12-edge web graph): per iteration ONE aggregation
    shuffle of the contribution stream (edge ⨝ rank on src — the edge
    list is deduped, cached, and hash-partitioned on src ONCE, and the
    rank table comes out of the previous iteration partitioned the same
    way, so the join itself reuses partitioning), plus a 1-row dangling
    aggregate that rides back in as a broadcast cross join — the driver
    never sees a value. Lineage is truncated every iteration with
    ``localCheckpoint`` (the standard iterative-plan pattern; see
    connected_components above).

    Self-loops are dropped, duplicate edges collapse to one, and edges
    touching nodes OUTSIDE ``nodes`` are dropped (induced subgraph): on a
    real link graph most dsts are uncrawled, and keeping such edges would
    leak their src's rank mass out of the distribution every iteration —
    a node whose links all point outside becomes dangling instead, so its
    mass is recycled. Ranks depend only on the induced edge set. No
    reference parity (grandine has no graph operator) — a BASELINE
    training-pipeline extension.
    """
    n = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .join(n.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(n.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .repartition("src")
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    try:
        n_nodes = n.count()
        if n_nodes == 0:
            return n.withColumn("rank", F.lit(0.0))
        base = (1.0 - damping) / n_nodes
        ranks = n.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint(eager=True)
        for _ in range(n_iter):
            contrib = (
                e.join(ranks.withColumnRenamed("node", "src"), "src")
                .join(deg, "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("inflow"))
            )
            dangling = (
                ranks.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
            )
            ranks = (
                n.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce("inflow", F.lit(0.0))
                            + F.col("dmass") / F.lit(float(n_nodes))
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks
    finally:
        e.unpersist()
        deg.unpersist()


def keep_best_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    score,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The deduplicated corpus with a QUALITY-aware keeper: per near-dup
    cluster, keep the row maximizing ``score`` (tie-break: min id), not
    the min-id row — what production pipelines actually ship (keep the
    longest / highest-quality variant of each duplicate cluster).
    ``score`` is a Column or column name evaluated over ``docs``;
    singletons (docs in no pair) are always kept.

    Plan: cluster labels from the log-round closure + ONE rank window per
    cluster. The window's partition count = number of clusters, dominated
    by singletons — no skew beyond the largest dup cluster, and the docs
    table shuffles once on cluster_id.
    """
    from pyspark.sql import Window

    score_col = F.col(score) if isinstance(score, str) else score
    comp = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "node", "_kb_node"
    )
    labeled = (
        docs.withColumn("_kb_score", score_col)
        .join(comp, F.col(id_col) == F.col("_kb_node"), "left")
        .withColumn("_kb_cluster", F.coalesce("component", F.col(id_col)))
        .drop("_kb_node", "component")
    )
    w = Window.partitionBy("_kb_cluster").orderBy(
        F.desc("_kb_score"), F.asc(id_col)
    )
    return (
        labeled.withColumn("_kb_rn", F.row_number().over(w))
        .filter(F.col("_kb_rn") == 1)
        .withColumnRenamed("_kb_cluster", "cluster_id")
        .drop("_kb_rn", "_kb_score")
    )
