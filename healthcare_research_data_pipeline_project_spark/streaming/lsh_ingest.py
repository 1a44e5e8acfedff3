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


def process_document_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
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
    has_index = any(
        e.startswith("batch=") for e in (
            os.listdir(index_dir) if os.path.isdir(index_dir) else []
        )
    )
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
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, _BATCH_FMT.format(batch_id))
        )
        new_idx.write.mode("overwrite").parquet(
            os.path.join(index_dir, _BATCH_FMT.format(batch_id))
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
) -> None:
    """Process the currently-available document backlog
    (Trigger.AvailableNow) through the incremental dedup, then stop.
    Re-running after new document files land continues from the
    checkpoint — only the new files are hashed and probed."""
    docs = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        docs.writeStream.foreachBatch(
            lambda bdf, bid: process_document_batch(
                spark, bdf, bid, index_dir, pairs_dir
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All pairs emitted so far, deduplicated across batches (a pair
    can only be emitted once — batches partition the doc ids — but
    distinct() keeps the read contract obvious)."""
    return (
        spark.read.parquet(os.path.join(pairs_dir, "batch=*"))
        .select("id_a", "id_b")
        .distinct()
    )
