#!/usr/bin/env python3
"""Compare a tools/soak_sweep.py artifact against the committed
BENCH_SOAK.json rows at the same scale — the reproducibility check for
the forked method: a regenerated row should land within host jitter of
the committed stitched row (both are fresh-JVM cold min-of-2).

Usage:
  python3 tools/check_sweep_vs_soak.py soak100x sweep_a.json [sweep_b.json ...]
Multiple sweep artifacts are min-merged per query first — the
committed rows are themselves minima over 2+ time-spaced cold passes,
so a single sweep on a burst-prone shared host is NOT the committed
method; two spaced invocations are. Prints per-query committed vs
regenerated with the ratio; exits 1 when a regenerated minimum is more
than 3x the committed row (even a bursty host recovers a spaced
min within that on this box — see host_factor for context).
"""
import json
import sys

scale = sys.argv[1]
sweeps = [json.load(open(p)) for p in sys.argv[2:]]
merged = {}
skipped_failed = set()
for s in sweeps:
    # soak_sweep.py records a FAILED fork's crash/attempt duration under
    # "queries" too — a fast crash must never min-merge in as a timing
    # (it would pass the reproducibility gate as a bogus 'reproduced'
    # row). Skip that sweep's failed names; report them separately.
    failed = set(s.get("failed", []))
    skipped_failed |= failed
    for q, sec in s["queries"].items():
        if q in failed:
            continue
        if q not in merged or sec < merged[q]:
            merged[q] = sec
hosts = [s.get("host_factor") for s in sweeps]
committed = json.load(open("BENCH_SOAK.json"))[scale]["queries"]
worst = 0.0
rows = []
for q, sec in sorted(merged.items()):
    c = committed.get(q)
    if c is None:
        rows.append(f"{q:32s} regenerated {sec:8.2f}s  (no committed row)")
        continue
    r = sec / c["soak_sec"] if c["soak_sec"] > 0 else float("inf")
    worst = max(worst, r)
    rows.append(f"{q:32s} committed {c['soak_sec']:8.2f}s  "
                f"regenerated {sec:8.2f}s  x{r:.2f}")
print("\n".join(rows))
if skipped_failed:
    print(f"excluded from min-merge (failed in >=1 sweep): "
          f"{sorted(skipped_failed)}")
never_timed = skipped_failed - set(merged)
print(f"worst regenerated/committed ratio: x{worst:.2f} "
      f"(sweep host_factors {hosts})")
if never_timed:
    print(f"FAIL: no successful timing in any sweep for {sorted(never_timed)}")
sys.exit(0 if worst <= 3.0 and not never_timed else 1)
