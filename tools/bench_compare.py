"""Compare two bench.py JSON artifacts and report per-query deltas.

    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
    python tools/bench_compare.py /tmp/before.json /tmp/after.json --pct 10
    python tools/bench_compare.py BENCH_r06.json BENCH_r07.json \
        --out BENCH_REGRESSIONS.json

Reads the LAST JSON object line of each file (bench artifacts may be
tail-truncated by the driver — the `headline` dict printed at the end
of the line survives truncation; if the full `queries` dict is
unparseable the headline is used instead). Prints regressions above
`--pct`, improvements, and queries present on only one side, then
exits 1 if any regression crossed the threshold — usable as a CI
gate around performance work.

Regression budget (r7 governance): any query regressing more than
`--budget-pct` (default 40%) must carry an annotation in
`tools/bench_annotations.json` ({query: reason}) naming the cause;
an unannotated budget breach makes the exit code 1 regardless of
`--pct`. `--out` writes the full regression table — every
over-threshold delta with its annotation status — as a committed
round artifact, so 150+ queries stay honest as the corpus grows:
silent drift has to either be explained or fail the round summary.

Canary adjudication (r10 governance): bench.py embeds machine-canary
fingerprints (fixed single-core Python-loop + multi-core BLAS
workloads, sampled around each best-of pass) in every artifact. When
a breach has no manual annotation, this tool reads both artifacts'
canaries: if either run's canary spread exceeds 1.5x within-run, or
the runs' best samples differ by more than 1.5x cross-run, the breach
is AUTO-annotated with the measured ratios (annotation_source:
"auto-canary" in the table — host weather, checkable against the
committed artifacts). If the canaries are steady, the breach stays
unannotated and the exit code demands a re-run or a real explanation:
a steady canary means the machine was not the cause.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ANNOTATIONS = os.path.join(os.path.dirname(__file__), "bench_annotations.json")


def load_normalized(path: str) -> dict[str, float] | None:
    """Canary-normalized per-query map (r11 bench.py artifacts carry
    `normalized.queries`: every timing scaled onto a fixed reference
    machine speed via the run's own py_loop canary). None for earlier
    artifacts or tail-truncated driver records."""
    try:
        d = json.load(open(path))
    except Exception:  # noqa: BLE001
        return None
    for cand in (d, d.get("parsed") or {}):
        if not isinstance(cand, dict):
            continue
        norm = cand.get("normalized")
        if isinstance(norm, dict) and isinstance(norm.get("queries"), dict):
            return {k: float(v) for k, v in norm["queries"].items()}
    return None


def load(path: str) -> dict[str, float]:
    last_err = None
    # whole-file parse first: BENCH_LOCAL_r*.json is pretty-printed
    # {"queries": {...}}; the driver's BENCH_r*.json wraps the compact
    # stdout line under "parsed"
    try:
        d = json.load(open(path))
        if isinstance(d, dict):
            for cand in (d, d.get("parsed") or {}):
                if isinstance(cand.get("queries"), dict) and cand["queries"]:
                    return {k: float(v) for k, v in cand["queries"].items()}
    except Exception as e:  # noqa: BLE001
        last_err = e
    for line in reversed(open(path).read().strip().splitlines()):
        line = line.strip()
        # driver artifacts wrap the JSON line in a record; find the
        # innermost {...} that parses
        for candidate in (line, line[line.find("{"):line.rfind("}") + 1]):
            try:
                d = json.loads(candidate)
            except Exception as e:  # noqa: BLE001
                last_err = e
                continue
            if isinstance(d, dict):
                if isinstance(d.get("queries"), dict) and d["queries"]:
                    return {k: float(v) for k, v in d["queries"].items()}
                if isinstance(d.get("headline"), dict):
                    return {k: float(v) for k, v in d["headline"].items()}
    raise SystemExit(f"{path}: no bench JSON found ({last_err})")


def load_canary(path: str) -> list[dict] | None:
    """Machine-canary fingerprints embedded in a bench artifact
    (bench.py records one before the run and one after each
    best-of pass). None for pre-r9 artifacts."""
    try:
        d = json.load(open(path))
    except Exception:  # noqa: BLE001
        return None
    for cand in (d, d.get("parsed") or {}):
        if isinstance(cand, dict) and isinstance(
            cand.get("machine_canary"), list
        ):
            return cand["machine_canary"]
    return None


def load_clean_flag(path: str) -> bool | None:
    """The r13 `canary_clean` stamp: True iff the run's within-run
    canary spread stayed under bench.py's designation limit. None for
    pre-r13 artifacts (no stamp — treat as unknown, not clean)."""
    try:
        d = json.load(open(path))
    except Exception:  # noqa: BLE001
        return None
    for cand in (d, d.get("parsed") or {}):
        if isinstance(cand, dict) and isinstance(
            cand.get("canary_clean"), bool
        ):
            return cand["canary_clean"]
    return None


def canary_verdict(
    before: list[dict] | None,
    after: list[dict] | None,
    drift_ratio: float = 1.5,
) -> tuple[bool, str]:
    """(machine_drifted, evidence). Drift is established by either
    fingerprint set: the canary's fixed workloads (single-core Python
    loop, multi-core BLAS matmul) spreading more than `drift_ratio`
    WITHIN one run (the host slowed mid-run), or the cross-run ratio
    of the runs' best canary samples exceeding it (the two rounds saw
    different machines). The evidence string embeds the numbers, so
    the committed annotation is checkable against the artifacts."""

    def spread(c: list[dict], key: str) -> tuple[float, float]:
        vals = [s[key] for s in c if isinstance(s.get(key), (int, float))]
        return (min(vals), max(vals)) if vals else (0.0, 0.0)

    parts, drifted = [], False
    for key in ("blas_matmul_sec", "py_loop_sec"):
        for label, c in (("before", before), ("after", after)):
            if not c:
                continue
            lo, hi = spread(c, key)
            if lo > 0:
                ratio = hi / lo
                parts.append(f"{key} {label} {lo:.3f}-{hi:.3f}s "
                             f"(x{ratio:.2f} within-run)")
                if ratio > drift_ratio:
                    drifted = True
        if before and after:
            blo, _ = spread(before, key)
            alo, _ = spread(after, key)
            if blo > 0 and alo > 0:
                ratio = max(alo / blo, blo / alo)
                parts.append(f"{key} best-of cross-run x{ratio:.2f}")
                if ratio > drift_ratio:
                    drifted = True
    if not parts:
        return False, "no canary fingerprints in either artifact"
    return drifted, "; ".join(parts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--pct", type=float, default=10.0,
                    help="regression threshold in percent (default 10)")
    ap.add_argument("--floor", type=float, default=0.2,
                    help="ignore queries faster than this in BOTH runs "
                         "(noise floor, default 0.2s)")
    ap.add_argument("--budget-pct", type=float, default=40.0,
                    help="hard regression budget: a query over this "
                         "without an annotation fails the run "
                         "(default 40)")
    ap.add_argument("--out", default=None,
                    help="write the regression table (JSON) here")
    args = ap.parse_args()
    # prefer canary-NORMALIZED maps when both artifacts carry them
    # (r11): deltas are then code signal projected onto one reference
    # machine speed, not host weather. Raw maps remain the fallback
    # for pre-r11 artifacts and truncated driver records.
    bn, an = load_normalized(args.before), load_normalized(args.after)
    basis = "normalized" if (bn and an) else "raw"
    b, a = (bn, an) if basis == "normalized" else (load(args.before), load(args.after))
    print(f"comparison basis: {basis}")
    notes: dict[str, str] = {}
    if os.path.exists(ANNOTATIONS):
        notes = json.load(open(ANNOTATIONS))
    # machine-generated adjudication (r10): breaches on a run whose
    # canary fingerprints show host drift are auto-annotated with the
    # measured ratios; breaches with steady canaries must carry a
    # hand-written annotation or the run fails — i.e. a re-run (or a
    # real explanation) is demanded exactly when the machine was NOT
    # the cause.
    drifted, canary_evidence = canary_verdict(
        load_canary(args.before), load_canary(args.after)
    )
    # clean-vs-clean discipline (r13): a comparison is only a code-
    # regression signal when BOTH artifacts were stamped canary-clean;
    # otherwise say so up front rather than emitting wolf-cry rows.
    before_clean = load_clean_flag(args.before)
    after_clean = load_clean_flag(args.after)
    print(
        f"canary_clean: before={before_clean} after={after_clean}"
        + (
            ""
            if before_clean and after_clean
            else "  (NOT clean-vs-clean — deltas below mix in host weather)"
        )
    )
    auto_note = (
        f"auto-canary: host drifted during/between runs — {canary_evidence}"
        if drifted
        else None
    )
    common = sorted(set(b) & set(a))
    regs, imps = [], []
    for k in common:
        if b[k] < args.floor and a[k] < args.floor:
            continue
        delta = (a[k] - b[k]) / b[k] * 100 if b[k] else 0.0
        if delta >= args.pct:
            regs.append((delta, k))
        elif delta <= -args.pct:
            imps.append((delta, k))
    print(f"common queries: {len(common)}; "
          f"only-before: {sorted(set(b) - set(a))or '[]'}; "
          f"only-after: {sorted(set(a) - set(b)) or '[]'}")
    breaches = []
    resolved_notes: dict[str, tuple[str, str]] = {}
    for delta, k in sorted(regs, reverse=True):
        over = delta >= args.budget_pct
        note, source = notes.get(k), "manual"
        if over and not note and auto_note:
            note, source = auto_note, "auto-canary"
        if note:
            resolved_notes[k] = (note, source)
        tag = ""
        if over:
            tag = (f"  [budget breach ({source}): {note}]" if note
                   else "  [BUDGET BREACH — unannotated, canary steady:"
                        " re-run or explain]")
            if not note:
                breaches.append(k)
        print(f"REGRESSION {delta:+7.1f}%  {k}: "
              f"{b[k]:.2f}s -> {a[k]:.2f}s{tag}")
    for delta, k in sorted(imps):
        print(f"improved   {delta:+7.1f}%  {k}: {b[k]:.2f}s -> {a[k]:.2f}s")
    print(f"{len(regs)} regressions >= {args.pct}%, "
          f"{len(imps)} improvements, "
          f"{len(common) - len(regs) - len(imps)} within noise, "
          f"{len(breaches)} unannotated budget breaches "
          f">= {args.budget_pct}%")
    if args.out:
        table = {
            "before": args.before,
            "after": args.after,
            "basis": basis,
            "threshold_pct": args.pct,
            "budget_pct": args.budget_pct,
            "canary": {
                "drifted": drifted,
                "evidence": canary_evidence,
                "before_clean": before_clean,
                "after_clean": after_clean,
            },
            "regressions": [
                {
                    "query": k,
                    "pct": round(delta, 1),
                    "before_s": round(b[k], 3),
                    "after_s": round(a[k], 3),
                    "over_budget": delta >= args.budget_pct,
                    "annotation": resolved_notes.get(k, (None, None))[0],
                    "annotation_source": resolved_notes.get(
                        k, (None, None)
                    )[1],
                }
                for delta, k in sorted(regs, reverse=True)
            ],
            "improvements": [
                {"query": k, "pct": round(delta, 1),
                 "before_s": round(b[k], 3), "after_s": round(a[k], 3)}
                for delta, k in sorted(imps)
            ],
            "unannotated_budget_breaches": breaches,
        }
        with open(args.out, "w") as f:
            json.dump(table, f, indent=1)
        print(f"# wrote {args.out}")
    # exit contract: unannotated budget breaches always fail; plain
    # over-`--pct` regressions fail only when the caller tightened the
    # budget down to the report threshold (the strict-CI-gate mode:
    # `--budget-pct` == `--pct`)
    if breaches:
        return 1
    if regs and args.budget_pct <= args.pct:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
