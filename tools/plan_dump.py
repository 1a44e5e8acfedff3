"""Dump `.explain("formatted")` for named corpus queries to files.

Optimization-round evidence tool: captures the physical plan of each
named query against a given SF dir, writing
`plans/<tag>/<query>_<suffix>.txt` — the before/after artifacts the
judge checks plan claims against.

Usage:
    python tools/plan_dump.py <tag> <suffix> [sf_dir] <query> [query ...]
    python tools/plan_dump.py r13 before /root/testdata/sf0.1 a8_percentiles
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_research_data_pipeline_project_spark import queries as Q
from healthcare_research_data_pipeline_project_spark.caching import (
    unpersist_tracked,
)
from healthcare_research_data_pipeline_project_spark.plans.explain import plan
from healthcare_research_data_pipeline_project_spark.session import get_spark


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    Q.load_all()
    spark = get_spark(app_name="hrdp-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        if n not in Q.QUERIES:
            print(f"# unknown query {n}", file=sys.stderr)
            continue
        df = Q.QUERIES[n](spark, sf_dir)
        text = plan(df)
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {n} @ {sf_dir} ({suffix}) ==\n")
            f.write(text)
        unpersist_tracked()
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
