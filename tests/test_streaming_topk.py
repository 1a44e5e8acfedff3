"""Pins for streaming SpaceSaving heavy hitters: bounded state,
SpaceSaving guarantees (est ≥ true ≥ est − err), heavy keys surviving
eviction across micro-batches, and the bucket merge."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.streaming import (
    surveillance as sv,
)
from healthcare_research_data_pipeline_project_spark.streaming import topk


def _write_drops(spark, path):
    """Three drops of a skewed stream: user 7 dominates, user 13 is a
    solid second, a rotating long tail churns the counters."""
    t0 = datetime.datetime(2024, 1, 1)
    eid = 0
    for s in range(3):
        rows = []
        for i in range(60):
            if i % 3 != 2:
                uid = 7 if i % 2 == 0 else 13
            else:
                uid = 100 + (eid % 25)  # long tail
            rows.append(
                (eid, t0 + datetime.timedelta(seconds=eid), uid, "view",
                 1.0, "{}")
            )
            eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        df.coalesce(1).write.mode("append").parquet(path)
        import time as _time

        _time.sleep(1.1)


def test_heavy_hitters_bounded_state_and_guarantees(spark, tmp_path):
    src = str(tmp_path / "hh")
    _write_drops(spark, src)
    stream = (
        spark.readStream.schema(sv.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rows = sv.run_available_now(
        topk.heavy_hitters_stream(stream, n_buckets=4, capacity=8),
        "t_hh",
        output_mode="update",
    )
    assert rows
    # final estimates per key
    final = {}
    for r in rows:
        if r["key"] not in final or r["est"] > final[r["key"]][0]:
            final[r["key"]] = (r["est"], r["err"])
    true = {
        r["user_id"]: r["cnt"]
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # SpaceSaving guarantees for every surviving candidate
    for key, (est, err) in final.items():
        assert est >= true[key], (key, est, true[key])
        assert est - err <= true[key], (key, est, err, true[key])
    # the two genuinely heavy keys must survive all eviction churn and
    # rank top-2 after the merge, with EXACT counts (never evicted)
    merged = topk.merge_heavy_hitters(
        spark.createDataFrame(
            [(r["bucket"], r["key"], r["est"], r["err"]) for r in rows],
            "bucket int, key long, est long, err long",
        ),
        k=2,
    ).collect()
    assert [m["key"] for m in merged] == [7, 13]
    assert merged[0]["est"] == true[7] and merged[0]["err"] == 0
    assert merged[1]["est"] == true[13] and merged[1]["err"] == 0


def test_heavy_hitters_drops_null_keys(spark, tmp_path):
    # a NULL user_id must be filtered before bucketing — it would
    # otherwise reach the state function as a NULL bucket and kill the
    # whole streaming query on one bad row
    src = str(tmp_path / "hh_null")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0, 7 if i % 2 == 0 else None, "view", 1.0, "{}")
            for i in range(20)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(sv.EVENT_SCHEMA).parquet(src)
    out = sv.run_available_now(
        topk.heavy_hitters_stream(stream, n_buckets=2, capacity=4),
        "t_hh_null",
        output_mode="update",
    )
    assert out, "query died instead of dropping NULL keys"
    assert all(r["key"] is not None for r in out)
    assert {r["key"] for r in out} == {7}
    assert max(r["est"] for r in out) == 10


# ---------------------------------------------------------------------------
# Streaming PSI drift monitor (streaming/drift.py): the windowed twin
# of dq_psi_drift — stream-vs-batch equivalence and drift ordering.
# ---------------------------------------------------------------------------
def test_streaming_psi_drift_matches_batch_and_ranks_shift(spark, tmp_path):
    import datetime as dt
    import time as _time

    from healthcare_research_data_pipeline_project_spark.streaming import (
        drift as DR,
        surveillance as sv,
    )

    src = str(tmp_path / "drift_src")
    t0 = dt.datetime(2024, 1, 1)
    # window 1 (minute 0-9): values match the reference band;
    # window 2 (minute 10-19): values shifted up — real drift
    rows = []
    eid = 0
    for i in range(300):
        rows.append((eid, t0 + dt.timedelta(seconds=i * 2), 1, "view",
                     float((i * 37) % 200), "{}"))
        eid += 1
    for i in range(300):
        rows.append((eid, t0 + dt.timedelta(minutes=10, seconds=i * 2), 1,
                     "view", 300.0 + float((i * 37) % 200), "{}"))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(src)

    # reference profile: same generator as window 1
    ref_rows = [(i, t0, 1, "view", float((i * 37) % 200), "{}")
                for i in range(300)]
    reference = DR.psi_reference_profile(
        spark.createDataFrame(
            ref_rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
    )

    stream = spark.readStream.schema(sv.EVENT_SCHEMA).parquet(src)
    counts_rows = sv.run_available_now(
        DR.windowed_bucket_counts(stream, window="10 minutes"),
        "t_drift_counts",
        output_mode="complete",
    )
    counts = spark.createDataFrame(
        counts_rows,
        "win_start timestamp, win_end timestamp, event_type string,"
        " bucket long, cur_cnt long",
    )
    psi = {
        (r["win_start"].minute, r["event_type"]): r["psi"]
        for r in DR.psi_from_bucket_counts(counts, reference).collect()
    }
    assert set(psi) == {(0, "view"), (10, "view")}
    # in-band window: tiny PSI; shifted window: strong drift signal
    assert psi[(0, "view")] < 0.1
    assert psi[(10, "view")] > 0.5

    # stream counts == batch counts over the same rows (equivalence)
    batch = spark.read.parquet(src)
    from pyspark.sql import functions as F2
    want = {
        (r["w"]["start"].minute, r["event_type"], r["bucket"]): r["c"]
        for r in batch.groupBy(
            F2.window("ts", "10 minutes").alias("w"),
            "event_type",
            DR.value_bucket().alias("bucket"),
        ).agg(F2.count(F2.lit(1)).alias("c")).collect()
    }
    got = {
        (r["win_start"].minute, r["event_type"], r["bucket"]): r["cur_cnt"]
        for r in counts.collect()
    }
    assert got == want
