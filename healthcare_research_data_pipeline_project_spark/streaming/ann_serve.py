"""Streaming ANN query serving from the persisted IVF-PQ index — the
online half of the trained-index lifecycle (`operators/similarity.py::
save_ann_index / append_to_ann_index / load_ann_index`).

Each micro-batch of arriving query vectors is served with
`ann_serve_topk` against the index as committed AT THAT BATCH: the
manifest is re-resolved per batch, so index appends and retrains that
commit BETWEEN batches are picked up atomically (a batch sees either
the old index or the new one, never a torn view — the atomic-manifest
read contract). Results write to per-batch-id subdirectories with
overwrite semantics, the replay-safe idempotency discipline every
foreachBatch maintainer in this package uses (`lsh_ingest`): a
replayed batch rewrites its own subdir against whatever index version
the manifest now names — at-least-once serving with last-write-wins
results, the semantics an online ANN service actually has (a replayed
request may legitimately see a newer index).

Reference anchor: the reference has no vector serving at all (SURVEY
§4 — batch SQL analytics over an RDBMS); this module composes the
beyond-reference ANN family with §2.10 Structured Streaming.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..caching import unpersist_tracked
from ..operators.similarity import ann_serve_topk, load_ann_index

#: result subdirs are keyed by micro-batch id (see lsh_ingest)
_BATCH_FMT = "batch={0}"

#: arriving query vectors: an id the caller correlates results by,
#: plus the embedding to search
QUERY_SCHEMA = "qid long, embedding array<double>"


def serve_query_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    results_dir: str,
    k: int = 5,
    nprobe: int | None = None,
) -> None:
    """Serve one micro-batch of query vectors and commit its results
    subdir. The index manifest is resolved HERE, per batch — appends
    that committed since the last batch serve immediately."""
    index = load_ann_index(spark, index_dir)
    try:
        out = ann_serve_topk(
            index, batch_df, k=k, nprobe=nprobe, exclude_self=False
        )
        out.write.mode("overwrite").parquet(
            os.path.join(results_dir, _BATCH_FMT.format(batch_id))
        )
    finally:
        unpersist_tracked()


def run_ann_serve(
    spark: SparkSession,
    queries_source_dir: str,
    index_dir: str,
    results_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    nprobe: int | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the currently-available query backlog
    (Trigger.AvailableNow) through the ANN server, then stop.
    Re-running after new query files land continues from the
    checkpoint — only new queries are served."""
    q = (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(queries_source_dir)
    )
    stream = (
        q.writeStream.foreachBatch(
            lambda bdf, bid: serve_query_batch(
                spark, bdf, bid, index_dir, results_dir,
                k=k, nprobe=nprobe,
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()


def read_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """All served results so far (qid, cid, dist, rank), across
    batches — batches partition the query ids, so the union is the
    one-shot serve over everything."""
    return spark.read.parquet(os.path.join(results_dir, "batch=*"))
