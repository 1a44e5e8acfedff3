"""Trace every Spark job one query launches, with stage names/tasks.

Usage: python tools/job_trace.py <query> [sf_dir] [--runs N]

Runs the query N+1 times (first run pays one-time artifact builds and
is discarded), then prints, for the LAST run, one line per job with
its stages — the instrument for 'where do this query's jobs come
from?' during the optimization round.
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


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    Q.load_all()
    spark = get_spark(app_name="hrdp-job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    from healthcare_research_data_pipeline_project_spark.healthcare.mapping import (
        ensure_warehouse,
    )

    ensure_warehouse(spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    fn = Q.QUERIES[name]
    # discard run: artifact builds, codegen
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    unpersist_tracked()

    group = f"trace-{name}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    sc.setJobGroup(None, None)
    unpersist_tracked()

    jobs = sorted(tracker.getJobIdsForGroup(group))
    print(f"# {name}: {dt:.3f}s, {len(jobs)} jobs (steady-state run)")
    for jid in jobs:
        info = tracker.getJobInfo(jid)
        if info is None:
            print(f"job {jid}: <expired>")
            continue
        parts = []
        for sid in sorted(info.stageIds):
            si = tracker.getStageInfo(sid)
            if si is None:
                parts.append(f"s{sid}:?")
            else:
                nm = si.name.split("\n")[0][:40]
                parts.append(
                    f"s{sid}[{si.numCompletedTasks}/{si.numTasks}t] {nm}"
                )
        print(f"job {jid}: " + " | ".join(parts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
