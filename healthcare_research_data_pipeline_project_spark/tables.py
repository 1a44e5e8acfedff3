"""Loaders for the driver's parquet tables (see TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — a TPC-H-ish star schema plus an event stream,
a text corpus, and an embedding table.

Scale posture: `region`/`nation` are constant-size dimensions and are
always broadcast; `supplier`/`part`/`customer` grow with SF, so we
leave their join strategy to AQE (runtime-measured broadcast or
shuffled hash). Fact tables (`orders`, `lineitem`, `events`) are never
broadcast. At warehouse scale the facts would be written partitioned
by date and bucketed by their join key — see `sources/sinks.py`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: constant-cardinality dims safe to broadcast at any scale factor
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark refuses by
        # default; read nanos as long and truncate to microseconds (the
        # same ns→us truncation DuckDB/pandas apply).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


class Tables:
    """Lazy per-table accessor: `t.orders` builds the scan plan on
    first touch, so a query only opens the files it actually reads."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = table(self._spark, self._sf_dir, name)
        return self._cache[name]


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for `spark.sql` corpora."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
