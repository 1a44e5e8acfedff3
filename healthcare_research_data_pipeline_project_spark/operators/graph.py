"""Iterative graph operators: connected components for duplicate
clustering.

MinHash-LSH (operators/dedup.py) emits candidate *pairs*; turning
pairs into dedup *groups* (keep one doc per group) needs the connected
components of the candidate graph — the canonical last step of a
web-scale dedup pipeline.

Algorithm: hash-min label propagation ("small-star"-lite). Every node
starts labeled with itself; each round every node takes the min label
in its neighborhood; converged when no label changes. Rounds =
O(diameter) — near-dup graphs are unions of small cliques, so 2-4
rounds in practice. Each round is one join + one aggregation (all
key-partitioned shuffles Catalyst can plan as sort-merge); the
`localCheckpoint` after each round truncates the lineage so the plan
doesn't grow exponentially with iterations — required at ANY scale,
not just 100 TB.

The driver-side loop is control flow only (a convergence counter);
all data stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label each node of the undirected graph `edges` with the
    smallest node id reachable from it. Returns (node, component).

    Convergence is checked with a distributed count of changed labels;
    `max_iter` bounds the worst case (a path graph) — for dedup
    cliques the loop exits after 2-3 rounds.
    """
    sym = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # materialize the edge list ONCE — without this every round's join
    # re-executes the whole upstream pipeline that produced the pairs
    # (for LSH dedup that is the minhash + banding computation)
    sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            labels.join(sym, labels["node"] == sym["u"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nbr"))
        )
        # carry the changed-flag through the checkpoint so convergence
        # is a cheap aggregate over materialized rows, not an extra
        # old-vs-new join job per round
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nbr", "component")).alias(
                    "new_component"
                ),
                (F.coalesce("nbr", "component") < F.col("component"))
                .cast("int")
                .alias("chg"),
            )
            .withColumnRenamed("new_component", "component")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.sum("chg")).collect()[0][0]
        labels = new_labels.drop("chg")
        if not changed:
            break
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Assign every document a duplicate-cluster id from candidate
    pairs: docs in a connected component share the min doc_id as
    cluster_id; docs with no candidate pair are their own singleton
    cluster. Output: (doc_id, cluster_id, cluster_size, is_keeper).
    """
    comp = connected_components(pairs, pair_a, pair_b)
    labeled = (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labeled.join(sizes, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col(id_col) == F.col("cluster_id")).cast("int").alias("is_keeper"),
        )
    )
