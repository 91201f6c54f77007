"""Connected components over candidate-pair edges — dedup clustering.

Near-dup detection (operators.dedup) emits *pairs*; deduplication needs
*clusters* (keep one canonical doc per component, drop the rest). This
is the transitive-closure step: component id = min node id reachable.

Algorithm: iterative min-label propagation with pointer jumping
("hash-to-min" family — Rastogi et al. 2012-style), pure DataFrame ops:

  1. each node's label ← min(own label, min neighbor label)   [1 hop]
  2. label ← label's label                                    [pointer jump]

Step 2 makes convergence O(log diameter) instead of O(diameter), so a
chain of 10^6 near-dups resolves in ~20 rounds. Each round is two
equi-joins + one aggregation on (node, label) pairs — 16 bytes a row,
no document payloads — and the lineage is truncated per round with
``localCheckpoint`` so the plan does not grow with the iteration count
(the classic iterative-Spark failure mode).

The *output* (node → min reachable id) is algorithm-independent and
deterministic, so the roster query is DuckDB-oracle-checked against a
recursive-CTE transitive closure even though the Spark side iterates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Component labels for every node with ≥1 edge: (node, cluster_id).

    ``cluster_id`` is the minimum node id in the component. Isolated
    nodes never appear (they have no edges — callers union them back
    with label = own id if needed).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # materialize the edge list once: every iteration joins against it,
    # and without this the (possibly expensive) upstream edge-generation
    # plan would re-run per round
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("m"))
        )
        upd = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("m", "label")).alias("label"),
            )
        )
        # pointer jump: label ← label's label (labels are always node ids,
        # so the self-join below finds every label's current owner)
        x, y = upd.alias("x"), upd.alias("y")
        jumped = x.join(y, F.col("x.label") == F.col("y.node"), "left").select(
            F.col("x.node").alias("node"),
            F.coalesce(F.col("y.label"), F.col("x.label")).alias("label"),
        )
        new_labels = jumped.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list → (node, rank).

    Same iterative-DataFrame discipline as ``connected_components``:
    the edge list and out-degrees are materialized once, each round is
    join → aggregate → join (all keyed shuffles, 16-byte rows), and
    lineage is truncated per round. Dangling mass (nodes with no
    out-edges) is redistributed uniformly so ranks sum to 1 every
    round. Rows-only surface: fixed-point floats are not hash-stable
    across engines.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    e = e.distinct().localCheckpoint()
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("a").agg(F.count("*").alias("out_deg")).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        contribs = (
            e.join(deg, "a")
            .join(ranks.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling nodes (no out-edges) leak their rank; redistribute
        dangling = (
            ranks.join(deg.withColumnRenamed("a", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce("in_sum", F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 9).alias("rank"))
