"""Interleaved A/B of a dynamic SQL conf over chosen corpus queries.

Weather-proof harness for the optimization round: the shared host
drifts 1.5-2.5x across minutes, so sequential before/after runs
confound code with weather. This runs PASSES of (conf=A then conf=B)
per query, interleaved across the whole list, and reports best-of-N
per arm — both arms sample the same weather windows.

Usage:
    python tools/ab_conf.py <conf_key> <valA> <valB> [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_research_data_pipeline_project_spark import queries as Q
from healthcare_research_data_pipeline_project_spark.caching import (
    unpersist_tracked,
)
from healthcare_research_data_pipeline_project_spark.session import get_spark

PASSES = 2


def main() -> int:
    key, va, vb = sys.argv[1], sys.argv[2], sys.argv[3]
    rest = sys.argv[4:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    Q.load_all()
    spark = get_spark(app_name="hrdp-ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    from healthcare_research_data_pipeline_project_spark.healthcare.mapping import (
        ensure_warehouse,
    )

    ensure_warehouse(spark, sf_dir)

    def timed(n: str) -> float:
        t0 = time.time()
        Q.QUERIES[n](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        unpersist_tracked()
        return dt

    # discard pass: artifact builds + codegen warm
    for n in names:
        spark.conf.set(key, va)
        try:
            timed(n)
        except Exception as e:
            print(f"# warm {n} FAILED: {e}", file=sys.stderr)

    best: dict[tuple[str, str], float] = {}
    for _ in range(PASSES):
        for n in names:
            for val in (va, vb):
                spark.conf.set(key, val)
                try:
                    dt = timed(n)
                except Exception as e:
                    print(f"# {n}[{val}] FAILED: {e}", file=sys.stderr)
                    continue
                k = (n, val)
                if k not in best or dt < best[k]:
                    best[k] = dt
    spark.conf.set(key, va)

    print(f"{'A=' + va:>10} {'B=' + vb:>10} {'B/A':>6}  query   ({key})")
    ta = tb = 0.0
    for n in names:
        a, b = best.get((n, va)), best.get((n, vb))
        if a is None or b is None:
            continue
        ta += a
        tb += b
        print(f"{a:10.3f} {b:10.3f} {b / a:6.2f}  {n}")
    if ta:
        print(f"{ta:10.3f} {tb:10.3f} {tb / ta:6.2f}  TOTAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
