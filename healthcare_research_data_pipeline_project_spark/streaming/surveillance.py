"""Streaming surveillance — the Structured Streaming upgrade of the
reference's batch "REAL-TIME CLINICAL SURVEILLANCE" snapshot
(`healthcare-sql-analytics.sql:442-518`; aspiration flags
`healthcare-env-example.sh:74`, README "real-time notifications").

The reference has no streaming engine; semantics here are standard
Spark: event-time windows + watermark for late data, alert predicate,
sink via foreachBatch or memory (tests). The same windowed aggregation
is exposed as a batch twin (queries/corpus.py `events_hourly_rollup`)
so batch/stream parity is testable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over event parquet/json drops. In production
    this is the same code with a Kafka source — the transformation
    graph is source-agnostic."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark.
    State is bounded by the watermark (old windows finalize and drop) —
    the property the reference's batch re-scan lacks."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            "event_cnt",
            "total_value",
        )
    )


def alert_stream(
    events: DataFrame,
    error_threshold: int = 5,
    window: str = "30 minutes",
) -> DataFrame:
    """Surveillance alerts: windows where error-type events exceed a
    threshold (the fever-episode/HAI-risk pattern of sql:473-499 on
    streaming data)."""
    counts = (
        events.filter(F.col("event_type") == "error")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("error_cnt"))
    )
    return counts.filter(F.col("error_cnt") >= error_threshold).select(
        F.col("w").start.alias("window_start"),
        "error_cnt",
        F.lit("ERROR_SPIKE").alias("alert_type"),
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> list:
    """Drain everything currently available into a memory sink and
    return the rows — the deterministic test harness for streaming
    plans (Trigger.AvailableNow processes the full backlog then stops).

    Use output_mode='complete' for aggregations (append would hold
    rows until the watermark closes the window, which a one-shot drain
    never reaches) and 'append' for row streams."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    per-user event count + last-seen timestamp, carried across
    micro-batches in explicit group state (the shape for custom
    session/episode logic that windowed aggregation can't express).

    State is one small tuple per user — bounded by user cardinality,
    partitioned by the grouping key, never on the driver."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("events_seen", LongType()),
            StructField("last_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("events_seen", LongType()),
            StructField("last_ts", TimestampType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        total, last = (state.get if state.exists else (0, None))
        for pdf in pdfs:
            total += len(pdf)
            batch_max = pdf["ts"].max()
            last = batch_max if last is None or batch_max > last else last
        state.update((total, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events_seen": [total], "last_ts": [last]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, within: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop repeated event_ids arriving within
    the watermark horizon (`dropDuplicatesWithinWatermark`). This is
    the streaming twin of the batch `dedup_exact` operator — at-least-
    once sources (Kafka replays, file re-drops) become effectively-once
    rows with state bounded by the watermark, where the batch operator
    would need a full-history shuffle."""
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------------------------------------------
# Streaming corpus curation: the C4/Gopher quality cascade applied to a
# document stream. The projection is stateless (no watermark, no
# aggregation state), so the SAME expression graph as the batch corpus
# query (queries/datapipe5.py text_filter_cascade) runs incrementally —
# batch/stream unification for the curation front of a training-data
# pipeline: new document drops are scored on arrival instead of by
# periodic full rescans.
# ---------------------------------------------------------------------------
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)


def stream_documents(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over document parquet drops (Kafka-swappable,
    like `stream_events`)."""
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def curate_stream(docs: DataFrame) -> DataFrame:
    """keep/drop + fail_reasons per arriving document (append-mode
    row stream; no state)."""
    from ..functions.text import quality_cascade

    return quality_cascade(docs)


def transition_stream(events: DataFrame) -> DataFrame:
    """Incremental per-user event-type transition counts — the
    streaming twin of the batch `t_event_transitions` Markov matrix.

    Custom stateful operator (`applyInPandasWithState`): state is one
    (last_ts, last_event_id, last_type) tuple per user; each
    micro-batch sorts its rows per user by (ts, event_id), chains them
    onto the carried last event, and emits (from_type, to_type, n)
    COUNT INCREMENTS for the batch. Summing the increments by
    (from_type, to_type) downstream (or in a counts store) reproduces
    the batch matrix exactly — pinned by the stream-vs-batch test.

    Assumes per-user in-order arrival across micro-batches (an
    append-log source: file drops, a time-ordered Kafka partition per
    user). Out-of-order streams need a watermark reorder buffer in
    front; the state tuple stays O(users) either way, partitioned by
    the grouping key, never on the driver."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("from_type", StringType()),
            StructField("to_type", StringType()),
            StructField("n", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts", TimestampType()),
            StructField("last_eid", LongType()),
            StructField("last_type", StringType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        last_ts, last_eid, last_type = (
            state.get if state.exists else (None, None, None)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        counts: dict[tuple[str, str], int] = {}
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            for r in batch.itertuples(index=False):
                if last_type is not None:
                    k = (last_type, r.event_type)
                    counts[k] = counts.get(k, 0) + 1
                last_ts, last_eid, last_type = r.ts, r.event_id, r.event_type
            state.update((last_ts, last_eid, last_type))
        if counts:
            yield pd.DataFrame(
                {
                    "from_type": [k[0] for k in counts],
                    "to_type": [k[1] for k in counts],
                    "n": list(counts.values()),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
