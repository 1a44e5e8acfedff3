"""Pins for incremental aggregate view maintenance: a chain of
insert/delete CDC batches must leave the view exactly equal to a
full recompute over the surviving base rows, at every refresh point."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.operators import ivm
from healthcare_research_data_pipeline_project_spark.queries import QUERIES  # noqa: F401


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _cdc_df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double, op string")


def _expect(spark, live_rows):
    return {
        r["k"]: (r["cnt"], round(r["s"], 6))
        for r in _rows_df(spark, live_rows)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }


def _got(spark, path):
    return {
        r["k"]: (r["cnt"], round(r["sum_v"], 6))
        for r in ivm.read_agg_view(spark, path, ["v"]).collect()
    }


def test_refresh_chain_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "view")
    base = [("a", 1.0), ("a", 2.0), ("b", 10.0)]
    ivm.init_agg_view(_rows_df(spark, base), path, ["k"], ["v"])
    assert _got(spark, path) == _expect(spark, base)

    # batch 1: plain inserts (no op column)
    ins = [("a", 3.0), ("c", 7.0)]
    ivm.refresh_agg_view(spark, path, _rows_df(spark, ins), ["k"], ["v"])
    live = base + ins
    assert _got(spark, path) == _expect(spark, live)

    # batch 2: CDC with deletes — b vanishes entirely (count hits 0)
    cdc = [("b", 10.0, "D"), ("a", 1.0, "D"), ("d", 5.5, "I")]
    ivm.refresh_agg_view(
        spark, path, _cdc_df(spark, cdc), ["k"], ["v"], op_col="op"
    )
    live = [("a", 2.0), ("a", 3.0), ("c", 7.0), ("d", 5.5)]
    assert _got(spark, path) == _expect(spark, live)
    assert "b" not in _got(spark, path)

    # batch 3: re-insert a deleted key
    ivm.refresh_agg_view(
        spark, path, _rows_df(spark, [("b", 4.0)]), ["k"], ["v"]
    )
    live.append(("b", 4.0))
    assert _got(spark, path) == _expect(spark, live)


def test_served_avg_matches_recompute(spark, tmp_path):
    path = str(tmp_path / "view2")
    base = [("x", 1.0), ("x", 2.0), ("x", 4.0)]
    ivm.init_agg_view(_rows_df(spark, base), path, ["k"], ["v"])
    ivm.refresh_agg_view(
        spark, path, _cdc_df(spark, [("x", 1.0, "D")]), ["k"], ["v"], op_col="op"
    )
    row = ivm.read_agg_view(spark, path, ["v"]).collect()[0]
    assert row["cnt"] == 2
    assert row["avg_v"] == pytest.approx(3.0)


def test_refresh_swap_keeps_single_view_dir(spark, tmp_path):
    import os

    path = str(tmp_path / "view3")
    ivm.init_agg_view(_rows_df(spark, [("a", 1.0)]), path, ["k"], ["v"])
    ivm.refresh_agg_view(spark, path, _rows_df(spark, [("a", 1.0)]), ["k"], ["v"])
    sibs = sorted(os.listdir(tmp_path))
    assert sibs == ["view3"]  # no tmp/old dirs left behind


def test_streaming_view_maintenance_converges_to_batch(spark, tmp_path):
    # three CDC file drops streamed through foreachBatch refreshes:
    # the final view must equal one batch aggregation of the live rows
    import time as _time

    src = str(tmp_path / "cdc")
    drops = [
        [("a", 1.0, "I"), ("b", 10.0, "I")],
        [("a", 2.0, "I"), ("b", 10.0, "D"), ("c", 5.0, "I")],
        [("c", 5.0, "D"), ("c", 7.0, "I"), ("a", 1.0, "D")],
    ]
    for rows in drops:
        _cdc_df(spark, rows).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    path = str(tmp_path / "sview")
    ivm.init_agg_view(
        _rows_df(spark, []).limit(0), path, ["k"], ["v"]
    )
    stream = (
        spark.readStream.schema("k string, v double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ivm.maintain_view_stream(
        stream, path, ["k"], ["v"], op_col="op",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    live = [("a", 2.0), ("c", 7.0)]  # b fully deleted, a: one I survives
    assert _got(spark, path) == _expect(spark, live)


def test_batch_id_ledger_makes_refresh_idempotent(spark, tmp_path):
    path = str(tmp_path / "view4")
    ivm.init_agg_view(_rows_df(spark, [("a", 1.0)]), path, ["k"], ["v"])
    d = _rows_df(spark, [("a", 2.0)])
    ivm.refresh_agg_view(spark, path, d, ["k"], ["v"], batch_id=7)
    # redelivery of the SAME batch id must be a no-op
    ivm.refresh_agg_view(spark, path, d, ["k"], ["v"], batch_id=7)
    assert _got(spark, path) == _expect(spark, [("a", 1.0), ("a", 2.0)])
    # a new id applies, and the ledger carries forward across swaps
    ivm.refresh_agg_view(spark, path, d, ["k"], ["v"], batch_id=8)
    ivm.refresh_agg_view(spark, path, d, ["k"], ["v"], batch_id=7)
    assert _got(spark, path) == _expect(
        spark, [("a", 1.0), ("a", 2.0), ("a", 2.0)]
    )


def test_null_grouping_key_merges_as_one_group(spark, tmp_path):
    # NULL is one group in aggregation, so it must be one row in the
    # view after every refresh (plain = joins would fork duplicates)
    path = str(tmp_path / "view5")
    ivm.init_agg_view(
        spark.createDataFrame([(None, 1.0), ("a", 2.0)], "k string, v double"),
        path, ["k"], ["v"],
    )
    ivm.refresh_agg_view(
        spark, path,
        spark.createDataFrame([(None, 4.0)], "k string, v double"),
        ["k"], ["v"],
    )
    rows = ivm.read_agg_view(spark, path, ["v"]).collect()
    nulls = [r for r in rows if r["k"] is None]
    assert len(nulls) == 1
    assert nulls[0]["cnt"] == 2 and nulls[0]["sum_v"] == 5.0


def test_view_readable_through_crashed_refresh_attempt(spark, tmp_path):
    # manifest-pointer commit: a half-written next version that never
    # flipped the manifest is invisible to readers; the next refresh
    # allocates PAST it (never reuses a dir) and expires the junk
    import os

    path = str(tmp_path / "view6")
    ivm.init_agg_view(_rows_df(spark, [("a", 1.0)]), path, ["k"], ["v"])
    assert os.path.exists(os.path.join(path, "_latest.json"))
    # simulate a refresh that crashed after partially writing v=2 but
    # BEFORE the manifest rename
    crashed = os.path.join(path, "v=2")
    os.makedirs(crashed)
    open(os.path.join(crashed, "part-junk.parquet"), "w").write("junk")
    assert _got(spark, path) == _expect(spark, [("a", 1.0)])  # still v=1
    ivm.refresh_agg_view(
        spark, path, _rows_df(spark, [("a", 2.0)]), ["k"], ["v"]
    )
    assert _got(spark, path) == _expect(spark, [("a", 1.0), ("a", 2.0)])
    # retention keeps the new current AND the previously-served
    # version (a lazy reader frame survives one refresh); the crashed
    # v=2 junk — never readable — is gone, and the commit went to v=3
    dirs = sorted(n for n in os.listdir(path) if n.startswith("v="))
    assert dirs == ["v=1", "v=3"]


def test_retention_keeps_previous_served_version(spark, tmp_path):
    # a lazy frame obtained BEFORE a refresh must still collect after
    # it (the ADVICE race: expiring the superseded version under a
    # mid-scan or lazily-held reader). keep_last=2 makes one refresh
    # safe; the version before that IS expired.
    import os

    path = str(tmp_path / "view7")
    ivm.init_agg_view(_rows_df(spark, [("a", 1.0)]), path, ["k"], ["v"])
    held = ivm.read_agg_view(spark, path, ["v"])  # lazy, backed by v=1
    ivm.refresh_agg_view(
        spark, path, _rows_df(spark, [("a", 2.0)]), ["k"], ["v"]
    )
    assert held.collect()[0]["sum_v"] == 1.0  # v=1 still resolvable
    ivm.refresh_agg_view(
        spark, path, _rows_df(spark, [("a", 4.0)]), ["k"], ["v"]
    )
    dirs = sorted(n for n in os.listdir(path) if n.startswith("v="))
    assert dirs == ["v=2", "v=3"]  # v=1 expired two refreshes later


def test_refresh_schema_mismatch_raises(spark, tmp_path):
    # refreshing WITHOUT distinct_cols on a view initialized WITH them
    # must raise instead of silently projecting away the maintained
    # __hll_* sketch columns (ADVICE r5)
    import pytest as _pytest

    path = str(tmp_path / "view8")
    ivm.init_agg_view(
        spark.createDataFrame([("a", 1.0, 3)], "k string, v double, u int"),
        path, ["k"], ["v"], distinct_cols=["u"],
    )
    d = spark.createDataFrame([("a", 2.0, 5)], "k string, v double, u int")
    with _pytest.raises(ValueError, match="stored-but-unrequested"):
        ivm.refresh_agg_view(spark, path, d, ["k"], ["v"])
    with _pytest.raises(ValueError, match="requested-but-missing"):
        ivm.refresh_agg_view(
            spark, path, d, ["k"], ["v", "u"], distinct_cols=["u"]
        )
    # the matching call still works
    ivm.refresh_agg_view(
        spark, path, d, ["k"], ["v"], distinct_cols=["u"]
    )
    row = ivm.read_agg_view(
        spark, path, ["v"], distinct_cols=["u"]
    ).collect()[0]
    assert row["cnt"] == 2 and row["approx_distinct_u"] == 2.0


def test_sketch_view_matches_one_shot_estimate(spark, tmp_path):
    # mergeable approx-distinct: three incremental refreshes must end
    # at EXACTLY the estimate a one-shot hll_sketch_agg over all rows
    # gives (sketch union is lossless at fixed lgConfigK), and the
    # exactly-once ledger must hold for sketch measures too
    path = str(tmp_path / "view_hll")

    def rows(lo, hi):
        return spark.createDataFrame(
            [(("a" if i % 2 == 0 else "b"), float(i % 13), i % 29)
             for i in range(lo, hi)],
            "k string, v double, u int",
        )

    ivm.init_agg_view(rows(0, 40), path, ["k"], ["v"], distinct_cols=["u"])
    ivm.refresh_agg_view(
        spark, path, rows(40, 80), ["k"], ["v"],
        batch_id=1, distinct_cols=["u"],
    )
    ivm.refresh_agg_view(
        spark, path, rows(80, 120), ["k"], ["v"],
        batch_id=2, distinct_cols=["u"],
    )
    # redelivery no-ops for sketches exactly like sums
    ivm.refresh_agg_view(
        spark, path, rows(40, 80), ["k"], ["v"],
        batch_id=1, distinct_cols=["u"],
    )
    got = {
        r["k"]: (r["cnt"], r["approx_distinct_u"])
        for r in ivm.read_agg_view(
            spark, path, ["v"], distinct_cols=["u"]
        ).collect()
    }
    want = {
        r["k"]: (r["cnt"], r["est"])
        for r in rows(0, 120)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est"),
        )
        .collect()
    }
    assert got == want
    # the true distinct is 29 per key here; the estimate must be sane
    for cnt, est in got.values():
        assert cnt == 60 and abs(est - 29) <= 3


def test_sketch_view_rejects_deletes(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "view_hll_del")
    ivm.init_agg_view(
        _rows_df(spark, [("a", 1.0)]), path, ["k"], ["v"],
        distinct_cols=None,
    )
    with _pytest.raises(ValueError, match="insert-only"):
        ivm.refresh_agg_view(
            spark, path,
            spark.createDataFrame(
                [("a", 1.0, "D")], "k string, v double, op string"
            ),
            ["k"], ["v"], op_col="op", distinct_cols=["v"],
        )


def test_sketch_view_streaming_maintainer(spark, tmp_path):
    # continuous maintenance of the approx-distinct sketch measure:
    # after draining an insert-only stream, the view's estimate equals
    # the one-shot sketch estimate over everything streamed
    import time as _time

    src = str(tmp_path / "ins")
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        spark.createDataFrame(
            [("a" if i % 2 == 0 else "b", float(i), i % 17)
             for i in range(lo, hi)],
            "k string, v double, u int",
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    path = str(tmp_path / "sview_hll")
    empty = spark.createDataFrame([], "k string, v double, u int")
    ivm.init_agg_view(empty, path, ["k"], ["v"], distinct_cols=["u"])
    stream = (
        spark.readStream.schema("k string, v double, u int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ivm.maintain_view_stream(
        stream, path, ["k"], ["v"],
        checkpoint_dir=str(tmp_path / "ckpt_hll"),
        distinct_cols=["u"],
    )
    q.awaitTermination()
    got = {
        r["k"]: (r["cnt"], r["approx_distinct_u"])
        for r in ivm.read_agg_view(
            spark, path, ["v"], distinct_cols=["u"]
        ).collect()
    }
    want = {
        r["k"]: (r["cnt"], r["est"])
        for r in spark.read.parquet(src)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est"),
        )
        .collect()
    }
    assert got == want


def test_commit_lock_serializes_concurrent_refreshes(spark, tmp_path):
    # r7 hardening: a second committer entering while the lock is held
    # fails loudly instead of interleaving (the lost-update /
    # expired-dir race the r6 advice described)
    import os

    import pytest as _pytest
    from healthcare_research_data_pipeline_project_spark.operators import ivm

    base = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0)], "k string, v double"
    )
    path = str(tmp_path / "locked_view")
    ivm.init_agg_view(base, path, ["k"], ["v"])
    lock = os.path.join(path, "_commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    try:
        with _pytest.raises(RuntimeError, match="commit lock"):
            ivm.refresh_agg_view(
                spark, path, base, ["k"], ["v"]
            )
    finally:
        os.unlink(lock)
    # with the lock released the same refresh commits fine
    ivm.refresh_agg_view(spark, path, base, ["k"], ["v"])
    served = {
        r["k"]: r["cnt"]
        for r in ivm.read_agg_view(spark, path, ["v"]).collect()
    }
    assert served == {"A": 2, "B": 2}
