"""Pins for versioned snapshots: atomic publish, time travel,
crash-invisibility of uncommitted data, and retention."""

from __future__ import annotations

import os

import pytest

from healthcare_research_data_pipeline_project_spark.operators import versioned as V


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_publish_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    assert V.snapshot_write(_df(spark, [1, 2]), root) == 1
    assert V.snapshot_write(_df(spark, [3]), root) == 2
    # latest
    assert sorted(r["x"] for r in V.snapshot_read(spark, root).collect()) == [3]
    # time travel
    assert sorted(
        r["x"] for r in V.snapshot_read(spark, root, version=1).collect()
    ) == [1, 2]
    assert V.snapshot_history(root) == [1, 2]
    assert V.current_version(root) == 2


def test_uncommitted_data_is_invisible(spark, tmp_path):
    # simulate a crash between data write and manifest flip: a v=2 dir
    # exists but the manifest still points at 1 — readers and history
    # must not see it, and the next write must not collide with it
    root = str(tmp_path / "t2")
    V.snapshot_write(_df(spark, [1]), root)
    orphan = os.path.join(root, "v=2")
    _df(spark, [99]).write.parquet(orphan)  # data landed, commit didn't
    assert V.snapshot_history(root) == [1]
    assert sorted(r["x"] for r in V.snapshot_read(spark, root).collect()) == [1]
    # recovery: the next publish claims version 2; errorifexists makes
    # the collision with the orphan LOUD rather than silently merged
    with pytest.raises(Exception):
        V.snapshot_write(_df(spark, [2]), root)


def test_expire_keeps_current_and_raises_on_zero(spark, tmp_path):
    root = str(tmp_path / "t3")
    for vals in ([1], [2], [3], [4]):
        V.snapshot_write(_df(spark, vals), root)
    dropped = V.expire_snapshots(root, keep_last=2)
    assert dropped == [1, 2]
    assert V.snapshot_history(root) == [3, 4]
    # time travel to an expired version fails loudly
    with pytest.raises(FileNotFoundError):
        V.snapshot_read(spark, root, version=1)
    # current still reads
    assert sorted(r["x"] for r in V.snapshot_read(spark, root).collect()) == [4]
    with pytest.raises(ValueError):
        V.expire_snapshots(root, keep_last=0)


def test_read_empty_root_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "t4")
    os.makedirs(root)
    with pytest.raises(FileNotFoundError):
        V.snapshot_read(spark, root)
