"""Pins for the split-layout cache (`tables._spread`): the driver's
testdata ships one row group per file, so without intervention every
fact scan is one task. The cache relays the file into
`defaultParallelism` files ONCE (rename-committed, content-keyed on
source mtime/size); every subsequent read parallelizes at the scan
with zero per-query exchange. On multi-split warehouse inputs
(>=128 MB) the path short-circuits and never runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.tables import (
    _split_cache_dir,
    table,
)
from tests.conftest import SF_SMOKE


def test_split_cache_scan_is_parallel_with_no_exchange(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    assert li.rdd.getNumPartitions() > 1
    # the parallelism comes from the file layout, not a shuffle
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_split_cache_rows_identical_to_source(spark):
    cached = table(spark, SF_SMOKE, "lineitem")
    raw = table(spark, SF_SMOKE, "lineitem", spread=False)
    assert cached.exceptAll(raw).count() == 0
    assert raw.exceptAll(cached).count() == 0


def test_split_cache_commit_marker_and_reuse(spark):
    path = os.path.join(SF_SMOKE, "orders.parquet")
    table(spark, SF_SMOKE, "orders").count()
    cache = _split_cache_dir(path, spark.sparkContext.defaultParallelism)
    assert os.path.exists(os.path.join(cache, "_DONE"))
    before = sorted(os.listdir(cache))
    table(spark, SF_SMOKE, "orders").count()  # hit, not rebuild
    assert sorted(os.listdir(cache)) == before


def test_split_cache_key_tracks_source_and_parallelism(spark):
    path = os.path.join(SF_SMOKE, "orders.parquet")
    a = _split_cache_dir(path, 8)
    b = _split_cache_dir(path, 16)
    c = _split_cache_dir(os.path.join(SF_SMOKE, "lineitem.parquet"), 8)
    assert len({a, b, c}) == 3


def test_split_cache_prunes_stale_siblings_and_orphans(spark, tmp_path):
    # regenerated testdata (new mtime -> new key) must not accumulate
    # full table copies: committing a rebuild prunes committed
    # siblings of the same source ONCE THEY AGE PAST AN HOUR (r10
    # ADVICE: unconditional pruning could delete the cache a
    # concurrent process with a different nparts was actively reading
    # mid-query), and reaps orphaned .building-* staging dirs older
    # than four hours (crash leftovers; a live long build is spared)
    import shutil
    import time

    src = str(tmp_path / "orders.parquet")
    shutil.copy(os.path.join(SF_SMOKE, "orders.parquet"), src)
    nparts = spark.sparkContext.defaultParallelism
    table(spark, str(tmp_path), "orders").count()
    old_cache = _split_cache_dir(src, nparts)
    assert os.path.exists(os.path.join(old_cache, "_DONE"))
    # a crashed build's orphan, stale past the 4 h reap gate
    orphan = f"{old_cache}.building-99999-deadbeef"
    os.makedirs(orphan, exist_ok=True)
    os.utime(orphan, (time.time() - 5 * 3600, time.time() - 5 * 3600))
    # a RECENT orphan (a possibly-live concurrent build) must survive
    live_orphan = f"{old_cache}.building-99998-cafecafe"
    os.makedirs(live_orphan, exist_ok=True)
    # regenerate the source: same bytes, new mtime -> new cache key
    os.utime(src, None)
    table(spark, str(tmp_path), "orders").count()
    new_cache = _split_cache_dir(src, nparts)
    assert new_cache != old_cache
    assert os.path.exists(os.path.join(new_cache, "_DONE"))
    # the old sibling is FRESH (just built) -> age-gated, spared for
    # any concurrent reader
    assert os.path.exists(old_cache), "fresh sibling must survive the gate"
    assert os.path.exists(live_orphan), "recent .building must survive"
    assert not os.path.exists(orphan), "stale .building orphan not reaped"
    # backdate the old sibling past the gate; the next commit of ANY
    # same-source vintage prunes it
    os.utime(old_cache, (time.time() - 7200, time.time() - 7200))
    os.utime(src, None)
    table(spark, str(tmp_path), "orders").count()
    assert not os.path.exists(old_cache), "aged sibling not pruned"
    shutil.rmtree(live_orphan, ignore_errors=True)


def test_events_ts_normalized_through_cache(spark):
    ev = table(spark, SF_SMOKE, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0
