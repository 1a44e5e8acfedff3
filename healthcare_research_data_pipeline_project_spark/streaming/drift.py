"""Streaming distribution-drift monitoring — the windowed twin of the
batch PSI audit (`queries/datapipe6.py::dq_psi_drift`).

A training-data ingest pipeline needs drift detection ON ARRIVAL, not
in a nightly audit: each event-time window's value distribution is
compared (Population Stability Index) against a frozen REFERENCE
profile captured from known-good data. The streaming side stays a
single watermarked windowed aggregation — per (window, event_type,
bucket) counts, state bounded by windows-in-flight × types × buckets,
never by event volume — and the PSI reduction over those
bucket-cardinality rows runs at read time or in the sink, exactly the
`merge_heavy_hitters` pattern (a second stateful op inside the stream
would hit Structured Streaming's multi-aggregation restriction for
nothing: the counts frame is already tiny).

The PSI math is the batch query's verbatim: fixed-width value buckets
with a top catch-all, add-one smoothing, per-bucket terms rounded to
8 dp and summed in integer 1e-8 units so addition order cannot
perturb the result (the exactness doctrine).

Reference parity: the reference's aspiration-only real-time tier
(healthcare-env-example.sh:74 ENABLE_REAL_TIME_ANALYTICS) and its
batch anomaly scan (healthcare-data-pipeline-main.py:319-338), fused:
the anomaly statistics run continuously over the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bucketing identical to dq_psi_drift (queries/datapipe6.py)
PSI_BUCKET_W = 50
PSI_NB = 10


def value_bucket(value_col: str = "value"):
    return F.least(
        F.lit(PSI_NB - 1),
        F.floor(F.col(value_col) / PSI_BUCKET_W).cast("long"),
    )


def psi_reference_profile(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Frozen per-(type, bucket) histogram from known-good batch data —
    type×bucket cardinality, broadcastable at any corpus scale."""
    return events.groupBy(
        F.col(type_col).alias("event_type"),
        value_bucket(value_col).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("ref_cnt"))


def windowed_bucket_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """The streaming stage: per event-time window, per (type, bucket)
    counts. One watermarked aggregation; late rows beyond `watermark`
    drop out deterministically."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window),
            F.col(type_col).alias("event_type"),
            value_bucket(value_col).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cur_cnt"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "bucket",
            "cur_cnt",
        )
    )


def psi_from_bucket_counts(
    counts: DataFrame, reference: DataFrame
) -> DataFrame:
    """Final reduction (static frame of sink output): PSI per
    (window, event_type) between the window's bucket counts and the
    reference profile. Buckets observed on only one side participate
    with count 0 there (full outer on bucket, inside each type); the
    smoothing denominator uses the union bucket count, mirroring the
    batch query's per-type `nb`. All cross-bucket addition happens in
    integer 1e-8 units."""
    cur = counts.select(
        "win_start", "win_end", "event_type", "bucket", "cur_cnt"
    )
    # key frame: every (window, type) × every bucket either side saw
    wins = cur.select("win_start", "win_end", "event_type").distinct()
    ref_k = reference.select("event_type", "bucket", "ref_cnt")
    all_buckets = (
        cur.select("event_type", "bucket")
        .union(ref_k.select("event_type", "bucket"))
        .distinct()
    )
    grid = wins.join(all_buckets, "event_type")
    j = (
        grid.join(cur, ["win_start", "win_end", "event_type", "bucket"], "left")
        .join(ref_k, ["event_type", "bucket"], "left")
        .select(
            "win_start",
            "win_end",
            "event_type",
            "bucket",
            F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
            F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
        )
    )
    w_cols = ["win_start", "win_end", "event_type"]
    tot = j.groupBy(*w_cols).agg(
        F.sum("cur_cnt").alias("tot_cur"),
        F.sum("ref_cnt").alias("tot_ref"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = j.join(tot, w_cols)
    pc = (F.col("cur_cnt") + 1.0) / (F.col("tot_cur") + F.col("nb"))
    pr = (F.col("ref_cnt") + 1.0) / (F.col("tot_ref") + F.col("nb"))
    terms = p.select(
        *w_cols,
        "nb",
        F.round((pc - pr) * F.log(pc / pr) * 1e8, 0)
        .cast("long")
        .alias("term_u"),
    )
    return (
        terms.groupBy(*w_cols)
        .agg(
            F.max("nb").cast("long").alias("n_buckets"),
            F.round(F.sum("term_u") / 1e8, 6).cast("double").alias("psi"),
        )
        .orderBy("win_start", "event_type")
    )
