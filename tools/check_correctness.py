"""Local mirror of the driver's correctness gate.

Runs every `queries()` entry at a given SF dir, runs the matching
`oracle_sql()` in DuckDB over the same parquet, and compares:
row count, column names, and order-insensitive values (columns sorted
by name, rows sorted by all columns, exact equality after normalizing
to strings).

Usage: python tools/check_correctness.py [sf_dir] [query ...]

A full (unfiltered) run also writes MIRROR.json at the repo root —
{query: {"status": "pass"|"fail"|"rows_only", "rows": N, "sec": s}} —
so the complete-corpus verification is a committed artifact each
round, covering the queries the driver's 50-row gate window never
samples."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from healthcare_research_data_pipeline_project_spark.caching import (
    unpersist_tracked,
)
from healthcare_research_data_pipeline_project_spark.session import get_spark
from healthcare_research_data_pipeline_project_spark.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}

    def record(name, status, rows, t0):
        report[name] = {
            "status": status,
            "rows": rows,
            "sec": round(time.time() - t0, 2),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            record(name, "fail", None, t0)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        finally:
            # release query-internal persists once results materialize,
            # so cached blocks never accumulate across the corpus run
            unpersist_tracked()
        if name not in oracles:
            record(name, "rows_only", len(sdf), t0)
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            record(name, "fail", len(sdf), t0)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            record(name, "fail", len(sdf), t0)
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            record(name, "fail", len(sdf), t0)
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            failures.append(name)
            record(name, "fail", len(sdf), t0)
            diff_mask = (cs != co).any(axis=1)
            print(f"FAIL {name}: value mismatch in {int(diff_mask.sum())}/{len(cs)} rows")
            bad = diff_mask[diff_mask].index[:3]
            for i in bad:
                print(f"  spark : {cs.loc[i].to_dict()}")
                print(f"  oracle: {co.loc[i].to_dict()}")
            continue
        record(name, "pass", len(sdf), t0)
        print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    # full runs over the DRIVER's testdata persist the committed
    # artifact; ad-hoc dirs (CI-generated data, scale probes) are
    # checked but never overwrite the round's mirror record
    if not only and sf_dir.startswith("/root/testdata/"):
        import json

        out = {
            "sf_dir": sf_dir,
            "n_queries": len(report),
            "n_pass": sum(1 for v in report.values() if v["status"] == "pass"),
            "n_rows_only": sum(
                1 for v in report.values() if v["status"] == "rows_only"
            ),
            "n_fail": len(failures),
            "queries": report,
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MIRROR.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
