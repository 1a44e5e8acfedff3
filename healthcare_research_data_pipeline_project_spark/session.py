"""SparkSession factory.

The reference delegates all execution to an RDBMS plus pandas
(`healthcare-data-pipeline-main.py:495-505` builds a SQLAlchemy engine);
our engine's equivalent bootstrap is a tuned SparkSession.

Scale posture: these defaults are written for a real cluster and merely
*shrunk* by `shuffle_partitions` for local runs. At 100 TB you would
raise `spark.sql.shuffle.partitions` (or rely on AQE coalescing from a
high initial number), keep AQE skew-join on, and leave broadcast
thresholds to AQE runtime stats.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "healthcare-research-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching replace all of the reference's
      hand-tuning (its batch-size/worker env knobs,
      `healthcare-env-example.sh:65-67`).
    - Arrow on: any pandas-UDF path is vectorized.
    - UTC session timezone: date arithmetic hash-matches the DuckDB
      oracle regardless of host timezone.
    """
    cpus = default_parallelism()
    resolved_master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(resolved_master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect advisoryPartitionSizeInBytes when coalescing instead of
        # padding reducer count out to defaultParallelism — fewer, fuller
        # reducers; the setting Spark's AQE docs recommend for busy
        # clusters, and it removes per-task scheduling overhead when a
        # shuffle is small relative to the core count
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # with parallelismFirst off, the advisory size is the knob that
        # balances reducer fan-in: 2m keeps compute-heavy aggregations
        # (percentiles, multi-distinct) parallel at local test scale while
        # still collapsing kB-sized shuffles to one task. At warehouse
        # scale raise this back to 64-256m — partition count then comes
        # from data volume, which is the property that transfers.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` ahead of
        # every explode and lets it push below exchanges — when the
        # array is an expensive computed column (shingles, n-grams,
        # LSH bands) the whole expression is then evaluated twice, once
        # of those on the pre-repartition scan task. Measured 7x slowdown
        # on the decontamination query; our generators never feed empty
        # arrays where it matters, so drop the rule engine-wide.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # the generated-class cache defaults to 100 entries; a 176-query
        # workload holds several codegen units per query, so every
        # interleaved pass evicted everything and re-ran Janino per
        # query (measured: a8_percentiles 2.3-2.5 s cold-in-context vs
        # ~1.5 s re-run — the gap is recompilation, not data). 4000
        # entries keeps the whole corpus resident; generated classes
        # are KB-sized, so the ceiling is a few hundred MB of metaspace
        # at worst and irrelevant on a cluster driver
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.ui.enabled", "false")
    )
    # local mode runs every executor thread inside the driver JVM,
    # whose default heap is 1 GiB — 32 concurrent tasks in 1 GiB is a
    # GC treadmill (measured: the bench corpus's 1.5-2.0 s band is
    # GC-bound at the default). Size the heap like the executor it
    # actually is, but ONLY in local mode and never past what the host
    # can give: in client-mode cluster deploys the driver does no task
    # work and a blanket 24g request can fail JVM launch on a small
    # edge node (the r9 ADVICE finding). Cap at half the host's
    # MemTotal. Only effective if set before JVM launch — harmless
    # afterwards.
    if resolved_master.startswith("local"):
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", f"{_local_heap_gib()}g"
            ),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _local_heap_gib(want_gib: int = 24) -> int:
    """min(want, half of host MemTotal), floored at 1 GiB. Reads
    /proc/meminfo (Linux); falls back to a conservative 4 GiB when
    the host's memory is unknowable."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) // (1024 * 1024)
                    return max(1, min(want_gib, total_gib // 2))
    except OSError:
        pass
    return min(want_gib, 4)
