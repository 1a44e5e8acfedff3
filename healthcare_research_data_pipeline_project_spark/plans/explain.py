"""Physical-plan assertions — the engine's performance guardrails.

The prompt for 100 TB readiness is concrete: filters reach the scan
(`PushedFilters`), projections prune (`ReadSchema`), small dims
broadcast (`BroadcastHashJoin`), hot paths stay in whole-stage codegen.
These helpers make those properties *testable* so perf regressions
fail CI instead of surfacing at scale (reference has no analog — its
optimizer lives in the RDBMS)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan(df: DataFrame, mode: str = "formatted") -> str:
    """Capture `df.explain(mode)` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    out = []
    for line in plan(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out.append(s.removeprefix("PushedFilters:").strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    cols: list[str] = []
    for line in plan(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            schema = s.split("struct<", 1)[-1].rstrip(">")
            cols.extend(f.split(":")[0] for f in schema.split(",") if ":" in f)
    return cols


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen stages: operators inside
    one fused stage share a `*(N)` codegen id in the simple plan."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", plan(df, mode="simple"))))
