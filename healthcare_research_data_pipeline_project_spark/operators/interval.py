"""Keyless interval (range) join via bucketized equi-join.

"Points inside time windows" with NO shared equi key is the one join
shape where naive Spark falls back to BroadcastNestedLoopJoin — a
quadratic disaster at scale. The scalable rewrite: quantize the time
axis into fixed-width buckets, explode each interval to the buckets it
touches (≤ ceil(len/width)+1 rows), tag each point with its single
bucket, and equi-join on the bucket id — Catalyst runs a plain
shuffled hash/sort-merge join, partition-parallel — then post-filter
to the exact band. Each (point, interval) pair meets in exactly one
bucket (the point's), so no dedup is needed.

Pick `bucket_width` ≈ the typical interval length: shorter wastes rows
in the explode, longer packs too many points per bucket (the classic
bucketed range-join tradeoff, same as Databricks' range-join hints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(ts_col, width_us: int):
    return (F.unix_micros(ts_col) / F.lit(width_us)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_width_seconds: int,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    start <= point_ts <= end. Columns of both inputs must be disjoint
    apart from the timestamp columns named here.
    """
    w_us = int(bucket_width_seconds) * 1_000_000
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(_bucket(F.col(start), w_us), _bucket(F.col(end), w_us))
        ),
    )
    pt = points.withColumn("__b", _bucket(F.col(point_ts), w_us))
    return (
        pt.join(iv, "__b")
        .filter(F.col(point_ts).between(F.col(start), F.col(end)))
        .drop("__b")
    )
