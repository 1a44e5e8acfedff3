"""ANN quality/latency benchmark: one harness, five routes.

Runs the five ANN routes over the embeddings table at a target SF and
reports recall@5 / recall@10 plus wall seconds per route, written to
ANN_BENCH.md (committed per round). Recall is measured against the
EXACT ranking under each route's own distance — cosine for
brute/LSH/multi-probe, raw dot product for SQ8, squared L2 for
PQ(+refine) — so a route is never charged for using a different
metric, only for its approximation error under its own.

Usage: python tools/ann_bench.py [sf_dir ...]
       (default: /root/testdata/sf0.1 and .scale_probe/sf1 if built)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from healthcare_research_data_pipeline_project_spark import operators  # noqa: E402,F401
from healthcare_research_data_pipeline_project_spark.caching import (  # noqa: E402
    unpersist_tracked,
)
from healthcare_research_data_pipeline_project_spark.operators import (  # noqa: E402
    similarity as S,
)
from healthcare_research_data_pipeline_project_spark.session import (  # noqa: E402
    get_spark,
)
from healthcare_research_data_pipeline_project_spark.tables import (  # noqa: E402
    load_tables,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_IDS = list(range(8))
KS = (5, 10)


def _exact_by_score(emb, score_expr, ascending=False):
    """Exact top-max(KS) per query under an arbitrary pair score."""
    q = emb.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    pairs = F.broadcast(q).join(c, F.col("cid") != F.col("qid"))
    scored = pairs.select("qid", "cid", score_expr.alias("score"))
    order = (
        [F.asc("score"), "cid"] if ascending else [F.desc("score"), "cid"]
    )
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max(KS))
        .select("qid", "cid", "rank")
    )


def _topk_sets(rows, k):
    out: dict[int, set[int]] = {}
    for r in rows:
        if r["rank"] <= k:
            out.setdefault(r["qid"], set()).add(r["cid"])
    return out


def _recall(got_rows, exact_rows, k):
    got = _topk_sets(got_rows, k)
    exact = _topk_sets(exact_rows, k)
    hit = sum(len(got.get(q, set()) & s) for q, s in exact.items())
    tot = sum(len(s) for s in exact.values())
    return hit / tot if tot else None


def bench_sf(spark, sf_dir: str) -> list[dict]:
    emb = load_tables(spark, sf_dir).embeddings
    kmax = max(KS)

    cos = F.round(
        S._dot("qe", "ce")
        / (F.sqrt(S._dot("qe", "qe")) * F.sqrt(S._dot("ce", "ce"))),
        4,
    ).cast("double")
    dot = S._dot("qe", "ce")
    l2 = S._dot("qe", "qe") - 2 * S._dot("qe", "ce") + S._dot("ce", "ce")

    exact_cos = _exact_by_score(emb, cos).collect()
    exact_dot = _exact_by_score(emb, dot).collect()
    exact_l2 = _exact_by_score(emb, l2, ascending=True).collect()

    routes = [
        (
            "brute (exact cosine)",
            exact_cos,
            lambda: S.brute_force_topk(emb, QUERY_IDS, k=kmax),
        ),
        (
            "LSH 8-plane",
            exact_cos,
            lambda: S.lsh_topk(emb, QUERY_IDS, k=kmax),
        ),
        (
            "LSH multi-probe (nprobe=3)",
            exact_cos,
            lambda: S.lsh_multiprobe_topk(emb, QUERY_IDS, k=kmax, nprobe=3),
        ),
        (
            "SQ8 int8 dot",
            exact_dot,
            lambda: S.sq8_topk(emb, QUERY_IDS, k=kmax),
        ),
        (
            "PQ m=16 ADC + refine",
            exact_l2,
            lambda: S.pq_topk(
                emb, QUERY_IDS, k=kmax, m=16, ksub=32, refine=10 * kmax
            ),
        ),
    ]
    report = []
    for name, exact, thunk in routes:
        best = None
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = thunk().collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            unpersist_tracked()
        entry = {"route": name, "sec": round(best, 3)}
        for k in KS:
            entry[f"recall@{k}"] = round(_recall(rows, exact, k), 3)
        report.append(entry)
        print(f"# {sf_dir} {name}: {entry}", file=sys.stderr)
    return report


def main() -> None:
    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.1",
            os.path.join(REPO, ".scale_probe", "sf1"),
        )
        if os.path.isdir(d)
    ]
    spark = get_spark(app_name="hrdp-ann-bench")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "# ANN route benchmark",
        "",
        "Five ANN routes, one harness (`tools/ann_bench.py`): recall is",
        "against the exact ranking under each route's own metric (cosine /",
        "raw dot / squared L2), so the table isolates approximation error.",
        f"Queries: {len(QUERY_IDS)}; best-of-2 wall seconds on local[32].",
        "",
    ]
    for d in dirs:
        rep = bench_sf(spark, d)
        lines += [f"## {d}", ""]
        lines.append("| route | recall@5 | recall@10 | sec |")
        lines.append("|---|---|---|---|")
        for e in rep:
            lines.append(
                f"| {e['route']} | {e['recall@5']} | {e['recall@10']} "
                f"| {e['sec']} |"
            )
        lines.append("")
    out = os.path.join(REPO, "ANN_BENCH.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
