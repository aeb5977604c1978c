#!/usr/bin/env python3
"""Dev-only bench hygiene: pick the median-of-N quiet-box Bench runs
and stamp provenance INSIDE the JSON (run totals, which run won,
host conditions, source commit), then write it as BENCH_last.json
plus a round-stamped copy. Keeps the authoritative median
self-describing so a later working-tree re-run can be told apart
from the committed record. Not shipped; Scala library code is in src/.

Usage: python3 tools/bench_stamp.py <roundTag> <run1.json> <run2.json> ...
"""
import json
import subprocess
import sys

tag = sys.argv[1]
runs = [json.load(open(p)) for p in sys.argv[2:]]
totals = sorted(r["value"] for r in runs)
median_total = totals[len(totals) // 2]
winner = next(r for r in runs if r["value"] == median_total)
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
winner["provenance"] = {
    "median_of": len(runs),
    "run_totals_sec": totals,
    "conditions": "quiet box: fresh sbt -batch JVM per run, no sbt "
                  "server, no concurrent jobs, local[32]",
    "source_commit": commit,
    "round": tag,
}
out = json.dumps(winner)
for path in ("BENCH_last.json", f"BENCH_{tag}_quiet.json"):
    with open(path, "w") as f:
        f.write(out + "\n")
print(f"median {median_total}s of {totals} -> BENCH_last.json + "
      f"BENCH_{tag}_quiet.json @ {commit}")
