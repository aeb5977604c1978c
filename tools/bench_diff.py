#!/usr/bin/env python3
"""Dev-only per-query bench regression tracker.

Usage: python3 tools/bench_diff.py BENCH_r01.json BENCH_r02.json [pct]

Parses the driver's BENCH_r{N}.json wrappers (or a raw Bench JSON
line), joins per-query seconds, and flags regressions worse than
`pct` percent (default 30). Exit code 1 if any regression is flagged,
so it can gate a round. Not shipped; Scala library code lives in src/.
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:  # raw Bench line
        return doc["queries"]
    # driver wrapper: the JSON line is embedded in the "tail" field
    for line in doc.get("tail", "").splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line.split(" ", 1)[1]
        if line.startswith('{"metric"'):
            # Bench emits the full line then a compact summary (no
            # per-query map) — only the full one is diffable
            parsed = json.loads(line)
            if "queries" in parsed:
                return parsed["queries"]
    raise SystemExit(f"no bench JSON found in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    rows = []
    for q in sorted(set(old) | set(new)):
        a, b = old.get(q), new.get(q)
        if a is None or b is None:
            rows.append((q, a, b, None))
        else:
            rows.append((q, a, b, 100.0 * (b - a) / a))
    flagged = 0
    for q, a, b, d in rows:
        if d is None:
            print(f"{q:24s} {'-' if a is None else f'{a:6.2f}'} -> "
                  f"{'-' if b is None else f'{b:6.2f}'}   (added/removed)")
        else:
            mark = ""
            if d > pct and (b - a) > 0.5:  # ignore sub-half-second noise
                mark = "  <-- REGRESSION"
                flagged += 1
            print(f"{q:24s} {a:6.2f} -> {b:6.2f}  {d:+6.1f}%{mark}")
    ta = sum(v for v in old.values())
    tb = sum(v for v in new.values())
    print(f"{'TOTAL':24s} {ta:6.2f} -> {tb:6.2f}  "
          f"{100.0 * (tb - ta) / ta:+6.1f}%")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
