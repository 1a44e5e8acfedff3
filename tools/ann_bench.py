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


def _exact_scores(emb, score_expr):
    """TRUE score of every (query, candidate) pair — the ground truth
    the quality-based recall thresholds against."""
    q = emb.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    pairs = F.broadcast(q).join(c, F.col("cid") != F.col("qid"))
    return pairs.select("qid", "cid", score_expr.alias("score")).collect()


def _topk_sets(rows, k):
    out: dict[int, set[int]] = {}
    for r in rows:
        if r["rank"] <= k:
            out.setdefault(r["qid"], set()).add(r["cid"])
    return out


def _recall(got_rows, exact_all, k, ascending=False):
    """Quality-based recall: a returned neighbor counts as a hit when
    its TRUE score is at least as good as the true k-th best for that
    query. On a near-dup-heavy corpus (this one plants duplicates and
    tight blobs) the top-k SET is tie-degenerate — thousands of
    candidates share the rounded best score — so set-overlap recall
    reads ~0 even for a perfect index; score-threshold recall is the
    standard fix (it asks 'are the answers as close as the true
    k-th?', which is what an ANN promises)."""
    scores = {(r["qid"], r["cid"]): r["score"] for r in exact_all}
    kth: dict[int, float] = {}
    per_q: dict[int, list[float]] = {}
    for (q, _), s in scores.items():
        per_q.setdefault(q, []).append(s)
    for q, vals in per_q.items():
        vals.sort(reverse=not ascending)
        kth[q] = vals[min(k, len(vals)) - 1]
    eps = 1e-9
    hit = tot = 0
    for r in got_rows:
        if r["rank"] > k:
            continue
        tot += 1
        s = scores.get((r["qid"], r["cid"]))
        if s is None:
            continue
        if (not ascending and s >= kth[r["qid"]] - eps) or (
            ascending and s <= kth[r["qid"]] + eps
        ):
            hit += 1
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

    exact_cos = _exact_scores(emb, cos)
    exact_dot = _exact_scores(emb, dot)
    exact_l2 = _exact_scores(emb, l2)

    routes = [
        (
            "brute (exact cosine)",
            exact_cos,
            False,
            lambda: S.brute_force_topk(emb, QUERY_IDS, k=kmax),
        ),
        (
            "LSH auto (default: derived planes/nprobe)",
            exact_cos,
            False,
            lambda: S.lsh_topk(emb, QUERY_IDS, k=kmax),
        ),
        (
            "LSH 8-plane single-bucket (pre-r7 default)",
            exact_cos,
            False,
            lambda: S.lsh_topk(emb, QUERY_IDS, k=kmax, num_planes=8),
        ),
        (
            "LSH multi-probe (8 planes, nprobe=3)",
            exact_cos,
            False,
            lambda: S.lsh_multiprobe_topk(
                emb, QUERY_IDS, k=kmax, num_planes=8, nprobe=3
            ),
        ),
        (
            "LSH 4-plane single-bucket",
            exact_cos,
            False,
            lambda: S.lsh_topk(emb, QUERY_IDS, k=kmax, num_planes=4),
        ),
        (
            "LSH multi-probe (8 planes, nprobe=8)",
            exact_cos,
            False,
            lambda: S.lsh_multiprobe_topk(
                emb, QUERY_IDS, k=kmax, num_planes=8, nprobe=8
            ),
        ),
        (
            "SQ8 int8 dot",
            exact_dot,
            False,
            lambda: S.sq8_topk(emb, QUERY_IDS, k=kmax),
        ),
    ]
    # PQ separates BUILD from QUERY (the standard ANN-bench split:
    # FAISS reports train/add and search independently): codebook
    # training is a one-time deterministic index build — production
    # queries amortize it to zero — so `sec` times the query path
    # against a prebuilt index and `build_sec` reports the build.
    t0 = time.time()
    pq_books = S.train_pq_codebooks(emb, m=16, ksub=32)
    pq_build = round(time.time() - t0, 3)
    routes.append(
        (
            "PQ m=16 ADC + refine (prebuilt codebooks)",
            exact_l2,
            True,
            lambda: S.pq_topk(
                emb, QUERY_IDS, k=kmax, m=16, ksub=32, refine=10 * kmax,
                codebooks=pq_books,
            ),
        )
    )
    # IVF-PQ shares the prebuilt codebooks (by_residual=False): the
    # composed production index — routing bounds the scan to nprobe
    # cells, PQ bounds the bytes, refine restores precision. The
    # DEFAULT row derives the routing depth from the corpus
    # (auto_ivf_nprobe: p25 sample routing recall >= 0.85 — r11; the
    # r10 fixed nprobe=2 served recall@5 0.25 at sf0.1). Routing-depth
    # derivation is a one-time index-build step, so it is timed into
    # build_sec, not the query path.
    t0 = time.time()
    auto_np = S.auto_ivf_nprobe(emb, k=5, metric="l2")
    np_build = round(time.time() - t0, 3)
    routes.append(
        (
            f"IVF-PQ auto (derived nprobe={auto_np}) + refine",
            exact_l2,
            True,
            lambda: S.ivfpq_topk(
                emb, QUERY_IDS, k=kmax, nprobe=auto_np, m=16, ksub=32,
                refine=10 * kmax, codebooks=pq_books,
            ),
        )
    )
    # the fixed shallow-routing row stays as the annotated reference:
    # it shows what the routing CAP costs on this corpus profile (a
    # true neighbor outside the probed cells is unreachable) — an
    # explicit opt-in, not the default.
    routes.append(
        (
            "IVF-PQ nprobe=2 routing-cap reference (opt-in)",
            exact_l2,
            True,
            lambda: S.ivfpq_topk(
                emb, QUERY_IDS, k=kmax, nprobe=2, m=16, ksub=32,
                refine=10 * kmax, codebooks=pq_books,
            ),
        )
    )
    report = []
    for name, exact, asc, thunk in routes:
        best = None
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = thunk().collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            unpersist_tracked()
        entry = {"route": name, "sec": round(best, 3)}
        if "IVF-PQ auto" in name:
            entry["build_sec"] = round(pq_build + np_build, 3)
        elif "prebuilt codebooks" in name or "IVF-PQ" in name:
            entry["build_sec"] = pq_build
        for k in KS:
            entry[f"recall@{k}"] = round(
                _recall(rows, exact, k, ascending=asc), 3
            )
        report.append(entry)
        print(f"# {sf_dir} {name}: {entry}", file=sys.stderr)

    # radius (range) search row (r12, VERDICT r11 #8): derived-depth
    # ivf_range_search against the exact τ screen. Recall here is
    # RADIUS recall — the fraction of TRUE in-radius (qid, cid) pairs
    # the routed scan returns — measured in the radius regime itself,
    # not through the k-NN proxy. Depth derivation is index-build work
    # (build_sec), same split as the top-k routes.
    tau = 0.30
    true_radius = {
        (r["qid"], r["cid"]) for r in exact_cos if r["score"] >= tau
    }
    t0 = time.time()
    auto_np_r = S.auto_ivf_nprobe(emb, metric="cos", tau=tau)
    np_r_build = round(time.time() - t0, 3)
    best = None
    got: set = set()
    for _ in range(2):
        t0 = time.time()
        got = {
            (r["qid"], r["cid"])
            for r in S.ivf_range_search(
                emb, QUERY_IDS, tau, nprobe=auto_np_r
            ).collect()
        }
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        unpersist_tracked()
    entry = {
        "route": f"IVF radius tau={tau} auto (derived nprobe={auto_np_r})",
        "sec": round(best, 3),
        "build_sec": np_r_build,
        "radius_recall": round(
            len(got & true_radius) / max(1, len(true_radius)), 3
        ),
    }
    report.append(entry)
    print(f"# {sf_dir} radius: {entry}", file=sys.stderr)
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
        "One harness (`tools/ann_bench.py`) over the ANN routes: recall is",
        "QUALITY-based against each route's own metric (cosine / raw dot /",
        "squared L2) — a returned neighbor counts when its true score is at",
        "least the true k-th best, the standard definition on near-dup-heavy",
        "corpora where the top-k SET is tie-degenerate.",
        f"Queries: {len(QUERY_IDS)}; best-of-2 wall seconds on local[32].",
        "",
        "Reading the LSH rows: the corpus's true neighbors sit at cosine",
        "~0.4, where a single 8-plane table retains a pair with probability",
        "(1 - theta/pi)^8 ~ 0.03 — the measured recall matches the math,",
        "not a defect, but it was the DEFAULT through r6. The r10 default",
        "is `auto_lsh_params_for`: the corpus's kth-NN cosine profile is",
        "MEASURED (deterministic 16-query brute sample, 25th percentile —",
        "the r7 tuner assumed cos 0.4 and a 0.5 retention target, which",
        "underdelivered on diffuse corpora: recall@5 0.525 at sf0.1), then",
        "(planes, nprobe) is the largest plane count whose Hamming-1",
        "retention stays >= 0.85 at that profile, subject to the expected-",
        "bucket candidate bound — the 'LSH auto' row, now >= 0.8 recall@5",
        "at every SF. The explicit-knob rows remain as the theory ladder;",
        "production near-dup use (cos >= 0.7) sits far up the same curve.",
        "This harness caught a REAL defect in round 6: SQ8",
        "ranked by raw integer code dot, which per-dimension affine offsets",
        "make non-monotone in the true dot (recall 0.025); ranking by",
        "dequantized reconstructions (the FAISS semantics) recovers 0.95.",
        "PQ reports index BUILD (codebook training, one-time, deterministic)",
        "separately from the query path, the standard ANN-bench split.",
        "The IVF-PQ rows compose the production index: coarse routing",
        "bounds the scan, PQ codes bound the bytes, refine restores",
        "precision. IVF recall is CAPPED by routing (a true neighbor",
        "outside the probed cells is unreachable), so the DEFAULT row",
        "(r11) derives nprobe per corpus — `auto_ivf_nprobe` exactly ranks",
        "a deterministic 16-query sample, counts quality-grade neighbors",
        "per cell, ranks cells exactly like the serving route, and takes",
        "the smallest depth whose 25th-percentile per-query routing recall",
        "clears 0.85 (the p25, not the mean: the mean overfit the sample —",
        "nprobe=8 at sf0.1 met it in-sample yet served 0.80 end-to-end",
        "once the ADC shortlist's own ~0.9 retention stacked on top).",
        "The fixed nprobe=2 row remains as the routing-cap reference: the",
        "r10 default, recall@5 0.25 at sf0.1 / 0.75 at sf1 — what an",
        "explicitly capped probe budget costs on a diffuse corpus where",
        "true neighbors sit at cos ~0.33 across cell boundaries. Routing-",
        "depth derivation is one-time index-build work (build_sec). All",
        "PQ rows share one trained index (by_residual=False keeps the",
        "codebooks corpus-global).",
        "The radius row (r12) serves `ivf_range_search` at its own",
        "derived depth: `auto_ivf_nprobe(tau=...)` measures per-query",
        "sample RADIUS recall (in-radius neighbors under the exact 4-dp",
        "tau screen, per-query denominators) and takes the smallest depth",
        "whose p25 clears 0.85 — the radius regime gets its own",
        "data-derived guarantee instead of inheriting the k-NN proxy.",
        "Its recall column is radius recall: |returned ∩ true-in-radius| /",
        "|true-in-radius| over the 8 bench queries.",
        "",
    ]
    for d in dirs:
        rep = bench_sf(spark, d)
        lines += [f"## {d}", ""]
        lines.append("| route | recall@5 | recall@10 | sec | build_sec |")
        lines.append("|---|---|---|---|---|")
        for e in rep:
            if "radius_recall" in e:
                lines.append(
                    f"| {e['route']} | {e['radius_recall']} (radius "
                    f"recall) | — | {e['sec']} | {e.get('build_sec', '-')} |"
                )
            else:
                lines.append(
                    f"| {e['route']} | {e['recall@5']} | {e['recall@10']} "
                    f"| {e['sec']} | {e.get('build_sec', '-')} |"
                )
        lines.append("")
    out = os.path.join(REPO, "ANN_BENCH.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
