"""Compare two bench.py JSON artifacts and report per-query deltas.

    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
    python tools/bench_compare.py /tmp/before.json /tmp/after.json --pct 10

Reads the LAST JSON object line of each file (bench artifacts may be
tail-truncated by the driver — the `headline` dict printed at the end
of the line survives truncation; if the full `queries` dict is
unparseable the headline is used instead). Prints regressions above
`--pct`, improvements, and queries present on only one side, then
exits 1 if any regression crossed the threshold — usable as a CI
gate around performance work.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, float]:
    last_err = None
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--pct", type=float, default=10.0,
                    help="regression threshold in percent (default 10)")
    ap.add_argument("--floor", type=float, default=0.2,
                    help="ignore queries faster than this in BOTH runs "
                         "(noise floor, default 0.2s)")
    args = ap.parse_args()
    b, a = load(args.before), load(args.after)
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
    for delta, k in sorted(regs, reverse=True):
        print(f"REGRESSION {delta:+7.1f}%  {k}: {b[k]:.2f}s -> {a[k]:.2f}s")
    for delta, k in sorted(imps):
        print(f"improved   {delta:+7.1f}%  {k}: {b[k]:.2f}s -> {a[k]:.2f}s")
    print(f"{len(regs)} regressions >= {args.pct}%, "
          f"{len(imps)} improvements, "
          f"{len(common) - len(regs) - len(imps)} within noise")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
