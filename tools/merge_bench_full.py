#!/usr/bin/env python3
"""Min-merge two (or more) BENCH_FULL-shaped runs into the committed
BENCH_FULL.json (driver-side tooling). Per-query best time across runs
(cold minima — each run is itself min-of-2 cold passes), passes
concatenated per query so the raw evidence is preserved, failed = union
(a query that ever failed is flagged), suspect = intersection (host
noise in ONE run is noise, in ALL runs it's a real exceedance).

Usage: python3 tools/merge_bench_full.py /tmp/a.json /tmp/b.json
"""
import json
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "pass at least one run file"
# set comparison, and a sorted iteration order: two runs covering the
# identical query set in a different insertion order are the SAME run
# shape — the old list equality rejected them with a misleading message
names = sorted(runs[0]["queries"])
for r in runs[1:]:
    assert set(r["queries"]) == set(names), "runs cover different query sets"

queries = {q: min(r["queries"][q] for r in runs) for q in names}
passes = {q: sum((r["passes"][q] for r in runs), []) for q in names}
failed = sorted(set().union(*[set(r["failed"]) for r in runs]))
suspect = sorted(set.intersection(*[set(r["suspect"]) for r in runs]))
total = round(sum(v for q, v in queries.items() if q not in failed), 3)

out = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": {q: round(v, 3) for q, v in queries.items()},
    "passes": passes, "failed": failed, "suspect": suspect,
    "sf": runs[0]["sf"], "cpus": runs[0]["cpus"],
}
with open("BENCH_FULL.json", "w") as f:
    json.dump(out, f, separators=(",", ":"))
print(f"BENCH_FULL.json: {len(names)} queries, total {total}s, "
      f"failed {failed}, suspect {suspect}")
