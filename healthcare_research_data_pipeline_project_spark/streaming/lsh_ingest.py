"""Continuously-maintained LSH dedup index — the streaming twin of
`operators/dedup.lsh_pairs_delta`.

Each micro-batch of arriving documents is the ingestion delta: the
batch is shingled/minhashed ONCE (`lsh_banded_index`), probes the
stored band index for cross-batch candidate pairs, self-joins for
intra-batch pairs, and then its band rows are appended to the index —
so the corpus is never re-hashed and per-batch work stays
delta-proportional, exactly the batch operator's contract. Stream ≡
batch is pinned by test: the union of per-batch pair emissions equals
the one-shot `lsh_candidate_pairs` sweep over everything ingested.

Replay safety (foreachBatch may re-run a batch after a failure): both
outputs write to per-batch-id subdirectories with overwrite semantics,
so a replayed batch rewrites its own subdir instead of duplicating
rows — the same idempotency discipline as the IVM ledger, without
needing one here because the batch id IS the key. On a real deployment
the subdir layout maps to Delta/Iceberg appends with the batch id as
the idempotent txn key.

Reference anchor: the reference has no streaming ingestion at all
(SURVEY §4 — batch ETL into an RDBMS); this module is part of the
beyond-reference LLM-pipeline surface, composing §2.10 streaming with
the dedup family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..caching import unpersist_tracked
from ..operators.dedup import lsh_banded_index, lsh_pairs_delta
from .surveillance import DOCUMENT_SCHEMA

#: band-index subdirs and pair subdirs are keyed by micro-batch id
_BATCH_FMT = "batch={0}"


def _index_glob(index_dir: str) -> str:
    return os.path.join(index_dir, "batch=*")


def _has_index(spark: SparkSession, index_dir: str) -> bool:
    """True iff the stored band index has ≥1 committed batch subdir.

    Probed through the Hadoop FileSystem API — NOT driver-local
    os.listdir — because index_dir is a Spark path: on HDFS/S3 (the
    deployment the module docstring maps to Delta/Iceberg appends) a
    local listdir is silently False every batch, which would silently
    drop every cross-batch candidate pair. globStatus returns null
    when the parent does not exist and an empty array when nothing
    matches; both mean "no index yet"."""
    sc = spark.sparkContext
    jvm = sc._jvm
    path = jvm.org.apache.hadoop.fs.Path(_index_glob(index_dir))
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    statuses = fs.globStatus(path)
    return statuses is not None and len(statuses) > 0


#: schema of the maintained cluster-assignment snapshot (the
#: `dedup_clusters` output shape)
_CLUSTER_SCHEMA = "doc_id long, cluster_id long, cluster_size long, is_keeper int"


def _committed_batch_ids(spark: SparkSession, state_dir: str) -> list[int]:
    """Batch ids with a committed subdir under `state_dir`, via the
    Hadoop FS API (works on any scheme — see `_has_index`)."""
    sc = spark.sparkContext
    path = sc._jvm.org.apache.hadoop.fs.Path(
        os.path.join(state_dir, "batch=*")
    )
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    statuses = fs.globStatus(path)
    ids = []
    for st in statuses or []:
        suffix = st.getPath().getName().split("=", 1)[-1]
        if suffix.isdigit():
            ids.append(int(suffix))
    return sorted(ids)


def _latest_cluster_state(
    spark: SparkSession, clusters_dir: str, before_batch_id: int
) -> DataFrame:
    """Newest committed cluster snapshot with batch id STRICTLY below
    `before_batch_id` — a replayed batch must fold onto the pre-batch
    state, never onto its own prior (possibly partial) write, so
    replays converge to the same snapshot."""
    ids = [
        b for b in _committed_batch_ids(spark, clusters_dir)
        if b < before_batch_id
    ]
    if not ids:
        return spark.createDataFrame([], _CLUSTER_SCHEMA)
    return spark.read.parquet(
        os.path.join(clusters_dir, _BATCH_FMT.format(max(ids)))
    )


def process_document_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    clusters_dir: str | None = None,
) -> None:
    """One ingestion step: emit the batch's delta pairs against the
    stored index, then append the batch's band rows to the index.
    Order matters — pairs first, against the index as it stood BEFORE
    this batch, so a replay that died between the two writes still
    converges (the pair set never depends on this batch's own index
    rows; intra-batch pairs come from the Δ⋈Δ branch)."""
    new_idx = lsh_banded_index(
        batch_df, "text", "doc_id", num_hashes, bands
    )
    has_index = _has_index(spark, index_dir)
    # first batch: probe an EMPTY index — the Δ⋈Δ branch alone emits
    # the batch's intra pairs. (The batch is hashed once for the pair
    # computation and once for the index write — both delta-sized; the
    # corpus-sized index is never re-hashed, which is the contract.)
    old_index = (
        spark.read.parquet(_index_glob(index_dir))
        if has_index
        else new_idx.limit(0)
    )
    pairs = lsh_pairs_delta(
        None, batch_df, "text", "doc_id",
        num_hashes, bands, old_index=old_index,
    )
    try:
        batch_pairs_dir = os.path.join(pairs_dir, _BATCH_FMT.format(batch_id))
        pairs.write.mode("overwrite").parquet(batch_pairs_dir)
        new_idx.write.mode("overwrite").parquet(
            os.path.join(index_dir, _BATCH_FMT.format(batch_id))
        )
        if clusters_dir is not None:
            # cluster maintenance rides the SAME delta rule one level
            # up (VERDICT r12 #5): merge this batch's pairs into the
            # pre-batch assignment snapshot via a union-find over
            # cluster representatives only — components are never
            # recomputed over the pair history. Inputs are both
            # replay-stable (pre-batch snapshot by construction of
            # _latest_cluster_state; the pair subdir was rewritten
            # above from the pre-batch index), so a replayed batch
            # converges to the identical snapshot. The local twin
            # materializes the FULL snapshot per batch (bounded test
            # corpora; ping-pong-style retention is the caller's); a
            # production deployment MERGEs the `changed_only=True`
            # rows into a Delta/Iceberg table keyed on doc_id instead
            # — the delta-proportional write shape.
            from ..operators.graph import incremental_dedup_clusters

            stored = _latest_cluster_state(spark, clusters_dir, batch_id)
            updated = incremental_dedup_clusters(
                stored,
                batch_df.select("doc_id"),
                spark.read.parquet(batch_pairs_dir),
            )
            updated.write.mode("overwrite").parquet(
                os.path.join(clusters_dir, _BATCH_FMT.format(batch_id))
            )
    finally:
        unpersist_tracked()


def run_lsh_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    clusters_dir: str | None = None,
) -> None:
    """Process the currently-available document backlog
    (Trigger.AvailableNow) through the incremental dedup, then stop.
    Re-running after new document files land continues from the
    checkpoint — only the new files are hashed and probed. With
    `clusters_dir`, each batch also folds its pairs into the
    maintained cluster-assignment snapshot (incremental connected
    components over cluster reps)."""
    docs = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        docs.writeStream.foreachBatch(
            lambda bdf, bid: process_document_batch(
                spark, bdf, bid, index_dir, pairs_dir,
                clusters_dir=clusters_dir,
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_clusters(spark: SparkSession, clusters_dir: str) -> DataFrame:
    """The current (newest committed) cluster-assignment snapshot."""
    ids = _committed_batch_ids(spark, clusters_dir)
    if not ids:
        return spark.createDataFrame([], _CLUSTER_SCHEMA)
    return spark.read.parquet(
        os.path.join(clusters_dir, _BATCH_FMT.format(max(ids)))
    )


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All pairs emitted so far, deduplicated across batches (a pair
    can only be emitted once — batches partition the doc ids — but
    distinct() keeps the read contract obvious)."""
    return (
        spark.read.parquet(os.path.join(pairs_dir, "batch=*"))
        .select("id_a", "id_b")
        .distinct()
    )
