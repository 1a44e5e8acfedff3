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


def _persistent_rdd_ids(spark) -> set:
    """Ids of RDD blocks currently pinned in the block manager —
    localCheckpoint stores its materialization here, and this is the
    only handle PySpark gives us to release a *checkpoint's* storage
    (DataFrame.unpersist only touches cacheManager entries).

    Assumption: the driver is single-threaded between the before/after
    snapshots that bracket each localCheckpoint. Anything persisted
    concurrently on the shared session in that window would be
    attributed to the loop and unpersisted with it. The snapshots are
    taken immediately around each checkpoint call to keep that window
    minimal; run the components loop on a dedicated session if other
    threads cache concurrently."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _unpersist_rdd_ids(spark, ids: set) -> None:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = m.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def _driver_union_find(spark, edge_rows) -> DataFrame:
    """Exact union-find on a collected edge list — the small-graph fast
    path. Returns the same (node, component=min reachable id) frame the
    distributed loop produces."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edge_rows:
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            # union by min id so the root IS the component label
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    return spark.createDataFrame(rows, "node long, component long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Label each node of the undirected graph `edges` with the
    smallest node id reachable from it. Returns (node, component).

    Each round does hash-min label propagation (take the min label in
    the neighborhood) followed by one pointer-jumping step (take your
    current label's label) — the shortcut makes convergence O(log
    diameter) rounds instead of O(diameter), so a 1M-long chain of
    near-dup pairs converges in ~20 rounds, not 1M. Convergence is
    checked with a distributed count of changed labels; if `max_iter`
    rounds are exhausted with labels still moving we RAISE rather than
    return silently-wrong cluster ids.

    Storage hygiene: every round's `localCheckpoint` (needed to stop
    the plan growing with iterations) is explicitly unpersisted once
    the next round's labels are materialized — peak extra storage is 2
    copies of the label table, not `max_iter` copies. The final round's
    checkpoint backs the returned DataFrame and stays alive.
    """
    spark = edges.sparkSession
    # adaptive small-graph path: near-dup pair graphs are usually tiny
    # relative to the corpus (edges ∝ real duplication, not data size).
    # Below the threshold an exact driver-side union-find beats N
    # distributed rounds of joins; above it the O(log d) loop below is
    # the only shape that scales. limit(threshold+1) bounds the probe —
    # it short-circuits without scanning the full edge list.
    probe = edges.select(
        F.col(src).cast("long"), F.col(dst).cast("long")
    ).limit(small_graph_threshold + 1).collect()
    if len(probe) <= small_graph_threshold:
        return _driver_union_find(spark, [(r[0], r[1]) for r in probe])

    before = _persistent_rdd_ids(spark)
    sym = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # materialize the edge list ONCE — without this every round's join
    # re-executes the whole upstream pipeline that produced the pairs
    # (for LSH dedup that is the minhash + banding computation)
    sym = sym.localCheckpoint(eager=True)
    sym_ids = _persistent_rdd_ids(spark) - before
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)
    label_ids = _persistent_rdd_ids(spark) - before - sym_ids

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            labels.join(sym, labels["node"] == sym["u"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nbr"))
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("component"), F.coalesce("nbr", "component")).alias(
                "component"
            ),
            F.col("component").alias("old_component"),
        )
        # pointer jumping: follow my (new) label to ITS label and take
        # the min — labels always point at reachable nodes, so the
        # shortcut preserves correctness while halving remaining
        # distance-to-root every round
        hop = labels.select(
            F.col("node").alias("component"), F.col("component").alias("hop")
        )
        # carry the changed-flag through the checkpoint so convergence
        # is a cheap aggregate over materialized rows, not an extra
        # old-vs-new join job per round
        new_labels = (
            stepped.join(hop, "component", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("hop", "component")).alias(
                    "component"
                ),
                (
                    F.least(F.col("component"), F.coalesce("hop", "component"))
                    < F.col("old_component")
                )
                .cast("int")
                .alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        new_ids = _persistent_rdd_ids(spark) - before - sym_ids - label_ids
        changed = new_labels.agg(F.sum("chg")).collect()[0][0]
        # previous round's checkpointed label blocks are dead now
        _unpersist_rdd_ids(spark, label_ids)
        label_ids = new_ids
        labels = new_labels.drop("chg")
        if not changed:
            converged = True
            break
    _unpersist_rdd_ids(spark, sym_ids)
    if not converged:
        # release the final round's label checkpoint too — without this
        # the raise leaks its blocks in long-lived sessions
        _unpersist_rdd_ids(spark, label_ids)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels are still moving — raise max_iter (graph diameter is "
            "pathological) instead of consuming truncated cluster ids"
        )
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
