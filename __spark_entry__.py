"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in
``healthcare_research_data_pipeline_project_spark/queries/`` — this
module is a thin adapter over that registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_research_data_pipeline_project_spark import queries as Q

Q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (executive summary) on /root/testdata/sf0.001."""
    return Q.QUERIES["exec_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Each callable first drains persists left by the PREVIOUS query
    # (query-internal persist() blocks are consumed by the caller's
    # action, so release is necessarily deferred to the next call —
    # keeps the driver's sequential gate run from accumulating cached
    # blocks across 50+ queries).
    from healthcare_research_data_pipeline_project_spark.caching import (
        unpersist_tracked,
    )

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            unpersist_tracked()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE)
