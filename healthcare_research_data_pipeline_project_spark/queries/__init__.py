"""Query corpus: every SURVEY.md §2 operator wired to the driver's
test tables, each paired with a DuckDB oracle (the correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a corpus query; `oracle` is DuckDB-runnable SQL over the
    same parquet views. Omitted oracle ⇒ driver does a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every corpus module so the registry is fully populated."""
    from . import (  # noqa: F401
        corpus,
        datapipe,
        datapipe2,
        datapipe3,
        datapipe4,
        datapipe5,
        extended,
        scale,
    )
    from ..healthcare import queries10  # noqa: F401
