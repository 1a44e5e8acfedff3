"""Incrementally-maintained rollup: a streaming materialized view.

The batch `events_hourly_rollup` recomputes the whole summary from
scratch; at 100 TB/day that rescan is the cost ceiling. This operator
maintains the same summary incrementally: a watermarked streaming
aggregation emits only the hour-windows updated by each micro-batch
(`update` output mode), and `foreachBatch` merges those deltas into a
persistent parquet summary by key. Restarts resume from the
checkpoint — the summary stays exactly-once consistent because the
merge is an idempotent last-write-wins upsert keyed on
(window_start, event_type).

The local sink is swap-on-write parquet (write temp, atomic rename);
on a real deployment the same `foreachBatch` body targets a Delta/
Iceberg `MERGE INTO` — the streaming graph is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sinks import upsert_by_key
from .surveillance import stream_events


def hourly_rollup_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The maintained aggregation — the streaming twin of the batch
    `events_hourly_rollup` query (same grouping, same outputs)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum("value").alias("total_value"),
        )
    )


def merge_rollup_batch(
    spark: SparkSession, batch_df: DataFrame, rollup_dir: str
) -> None:
    """Merge one micro-batch of updated windows into the parquet
    summary (last-write-wins on the window key; the incoming row
    carries the window's full current total, not a delta)."""
    batch_df = batch_df.coalesce(1)
    if os.path.exists(os.path.join(rollup_dir, "_SUCCESS")):
        existing = spark.read.parquet(rollup_dir)
        merged = upsert_by_key(
            existing, batch_df, ["window_start", "event_type"]
        )
    else:
        merged = batch_df
    tmp = rollup_dir.rstrip("/") + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(rollup_dir, ignore_errors=True)
    os.rename(tmp, rollup_dir)


def run_incremental_rollup(
    spark: SparkSession,
    source_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
) -> None:
    """Process the currently-available backlog (Trigger.AvailableNow)
    and fold it into the rollup, then stop. Re-running after new files
    arrive continues from the checkpoint — only new data is read."""
    agg = hourly_rollup_agg(stream_events(spark, source_dir))
    q = (
        agg.writeStream.foreachBatch(
            lambda bdf, _id: merge_rollup_batch(spark, bdf, rollup_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    return spark.read.parquet(rollup_dir)
