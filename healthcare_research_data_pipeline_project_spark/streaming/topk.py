"""Streaming heavy hitters with BOUNDED state — SpaceSaving over
Structured Streaming.

`stateful_user_counts` (surveillance.py) keeps one state row per key:
exact, but state grows with key cardinality — the wrong trade at
100 TB when only the top talkers matter. SpaceSaving (Metwally et
al.) caps state at `capacity` counters per partition: an unseen key
evicts the minimum counter and inherits its count as its error bound,
giving the classic guarantees (est ≥ true; est − err ≤ true; any key
with true count > est_min is IN the candidate set).

Scale shape: keys are sharded into `n_buckets` hash buckets;
`applyInPandasWithState` keeps one bounded SpaceSaving summary per
BUCKET (state = capacity × 3 numbers, whatever the key cardinality),
and every micro-batch emits the bucket's refreshed candidates in
update mode. The global top-k is a trivial final reduction over
n_buckets × capacity candidate rows — `merge_heavy_hitters` — run at
read time or in the sink. Per-bucket error bounds stay valid under
the merge because each key lives in exactly one bucket.

Reference parity: streaming twin of the batch `a21_countmin_sketch`
frequency estimator — the same bounded-memory doctrine, on a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "user_id",
    n_buckets: int = 8,
    capacity: int = 16,
) -> DataFrame:
    """Per-bucket SpaceSaving candidates over a key column:
    (bucket, key, est, err) rows re-emitted each micro-batch.

    `key_col` must be numeric (keys are tracked as int64 — hash a
    string key to a long first). Rows whose key is NULL or fails the
    long cast are dropped before bucketing: a NULL bucket would
    otherwise reach the state function and kill the streaming query
    on a single bad row."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("key", LongType()),
            StructField("est", LongType()),
            StructField("err", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(LongType())),
            StructField("ests", ArrayType(LongType())),
            StructField("errs", ArrayType(LongType())),
        ]
    )

    def update(group_key, pdfs, state: GroupState):
        bucket = int(group_key[0])
        if state.exists:
            keys, ests, errs = state.get
            summary = {
                k: [e, r] for k, e, r in zip(keys, ests, errs)
            }
        else:
            summary = {}
        batch = pd.concat(list(pdfs), ignore_index=True)
        for k, inc in batch.groupby("__k").size().items():
            k = int(k)
            if k in summary:
                summary[k][0] += int(inc)
            elif len(summary) < capacity:
                summary[k] = [int(inc), 0]
            else:  # evict the minimum counter; inherit its count
                mk = min(summary, key=lambda x: summary[x][0])
                m_est = summary.pop(mk)[0]
                summary[k] = [m_est + int(inc), m_est]
        ks = sorted(summary)
        state.update(
            (ks, [summary[k][0] for k in ks], [summary[k][1] for k in ks])
        )
        yield pd.DataFrame(
            {
                "bucket": [bucket] * len(ks),
                "key": ks,
                "est": [summary[k][0] for k in ks],
                "err": [summary[k][1] for k in ks],
            }
        )

    keyed = events.select(
        F.col(key_col).cast("long").alias("__k")
    ).filter(F.col("__k").isNotNull()).select(
        F.pmod(F.col("__k"), F.lit(n_buckets)).cast("int").alias("__b"),
        "__k",
    )
    return keyed.groupBy("__b").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_heavy_hitters(candidates: DataFrame, k: int = 10) -> DataFrame:
    """Final reduction over the emitted candidate rows (a static frame
    of sink output, or the memory-sink table): keep each key's LAST
    estimate (max est — estimates only grow) and return the global
    top-k by estimate, ties broken by key."""
    latest = candidates.groupBy("key").agg(
        F.max("est").alias("est"),
        F.max("err").alias("err"),
    )
    return latest.orderBy(F.desc("est"), "key").limit(k)
