"""Versioned table snapshots with time travel — the commit protocol
layer under warehouse maintenance.

Plain `mode("overwrite")` parquet is a destructive, non-atomic publish:
readers mid-swap see partial data, and yesterday's state is gone. The
lake-format answer (Delta/Iceberg) is snapshot versioning: every write
creates an immutable `v=<n>` directory, and a tiny manifest names the
current version; readers resolve the manifest first, so a publish is
one atomic manifest rename and old versions remain queryable (time
travel) until retention expires them.

This module is that protocol reduced to its engine-portable core:

- data: `table_root/v=<n>/` immutable parquet directories
- commit: `table_root/_latest.json` written via tmp + `os.rename`
  (atomic on POSIX; on an object store the same JSON goes through a
  conditional put)
- time travel: `snapshot_read(..., version=k)`
- retention: `expire_snapshots(keep_last=n)` never deletes the
  current version

Reference parity: the reference trusts its RDBMS for atomicity and
history (SURVEY §4); at lake scale the table format carries both, and
this is the minimal faithful model of it.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_latest.json")


def _read_manifest(root: str) -> dict:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return {"version": 0}
    with open(p) as f:
        return json.load(f)


def current_version(root: str) -> int:
    return int(_read_manifest(root)["version"])


def snapshot_write(df: DataFrame, root: str) -> int:
    """Publish a new immutable snapshot; returns its version number.
    The data directory is fully written BEFORE the manifest flips, so
    a crash mid-write leaves the previous version current."""
    os.makedirs(root, exist_ok=True)
    v = current_version(root) + 1
    data_dir = os.path.join(root, f"v={v}")
    df.write.mode("errorifexists").parquet(data_dir)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": v}, f)
    os.rename(tmp, _manifest_path(root))  # the atomic commit point
    return v


def snapshot_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or `version` for time travel."""
    v = current_version(root) if version is None else int(version)
    if v < 1:
        raise FileNotFoundError(f"{root}: no committed snapshot")
    data_dir = os.path.join(root, f"v={v}")
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(
            f"{root}: version {v} not found (expired or never committed)"
        )
    return spark.read.parquet(data_dir)


def snapshot_history(root: str) -> list[int]:
    """Committed, still-retained versions, ascending. Uncommitted
    leftovers (a crash between data write and manifest flip) are
    excluded — they are invisible to readers by construction."""
    cur = current_version(root)
    out = []
    for name in os.listdir(root):
        if name.startswith("v="):
            v = int(name.split("=", 1)[1])
            if v <= cur:
                out.append(v)
    return sorted(out)


def expire_snapshots(root: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` retained versions (always
    keeping the current one). Returns the versions removed."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    hist = snapshot_history(root)
    drop = hist[:-keep_last] if len(hist) > keep_last else []
    for v in drop:
        shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
    return drop
