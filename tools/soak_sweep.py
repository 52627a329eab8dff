#!/usr/bin/env python3
"""One-command forked scale-soak sweep (r16 verdict task 5): run every
registry query in its OWN fresh JVM and emit one merge-ready
BENCH_FULL-shaped artifact per invocation.

Why forked: the single-JVM 100x sweep accumulates executor state
across 230+ queries and OOMs a 48g heap (honestly aborted by Bench's
dead-context guard; see BENCH_SOAK.json note). The committed 100x rows
were therefore stitched from per-query fresh-JVM cold passes merged by
hand. This tool IS that method, mechanized: each query gets a fresh
JVM (cold JIT, cold Spark, min-of-2 in-JVM passes exactly like
graft.Bench, because each fork *is* graft.Bench restricted to one
query), a crashed or hung query is recorded as failed without
poisoning its neighbors, and the merged output feeds
tools/make_soak_report.py / tools/merge_new_soak.py unchanged.

The dead-context guard stays: it lives inside Bench, per JVM — a
context killed by an executor-thread OOM aborts that fork (nonzero
rc -> "failed" here) instead of mis-timing later queries.

Usage (regenerate a full 100x side):
  python3 tools/make_soak_data.py /tmp/sf10_soak 100
  python3 tools/soak_sweep.py --sf-dir /tmp/sf10_soak \
      --out /tmp/soak100_forked.json --mem 24g

Floor-minting / sf0.1 use: pass --retry-watermarks so Bench's adaptive
suspect-retry (vs committed sf0.1 floors) stays active; at soak scale
leave it off — every query would read "suspect" against an sf0.1
floor and waste three retry sweeps. Bench still measures the host
probe either way (it falls back to the committed repo watermarks for
the probe floor), so host_factor provenance lands in every fork and
the max across forks is reported in the merged artifact.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN = os.path.join(REPO, "tools", "run.sh")


def list_queries():
    out = subprocess.run([RUN, "graft.Bench", "--list"], cwd=REPO,
                         capture_output=True, text=True, check=True)
    return [l.strip() for l in out.stdout.splitlines() if l.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True,
                    help="merged BENCH_FULL-shaped artifact path")
    ap.add_argument("--queries", nargs="*", default=None,
                    help="default: every registry query (graft.Bench --list)")
    ap.add_argument("--mem", default="24g", help="driver heap per fork")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="seconds per fork before it is killed + failed")
    ap.add_argument("--retry-watermarks", action="store_true",
                    help="keep Bench's sf0.1-floor suspect retries (floor "
                         "minting); off for 10x/100x soak runs")
    ap.add_argument("--scratch", default=None,
                    help="per-fork artifact/log dir (default: <out>.d)")
    ap.add_argument("--env", action="append", default=[],
                    help="extra KEY=VALUE for every fork (repeatable) — e.g. "
                         "SPARK_GRAFT_IMG_DIR=<tools/make_soak_images.py output> "
                         "so the image queries soak on a scale corpus, as the "
                         "committed rows were measured")
    args = ap.parse_args()
    extra_env = dict(kv.split("=", 1) for kv in args.env)

    queries = args.queries if args.queries else list_queries()
    scratch = args.scratch or (args.out + ".d")
    os.makedirs(scratch, exist_ok=True)

    merged, passes, failed, factors = {}, {}, [], {}
    t_start = time.time()
    for i, q in enumerate(queries, 1):
        frag = os.path.join(scratch, q + ".json")
        log = os.path.join(scratch, q + ".log")
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_BENCH_FULL=frag,
                   SPARK_GRAFT_CPUS=args.cpus,
                   SPARK_DRIVER_MEM=args.mem,
                   **extra_env)
        if not args.retry_watermarks:
            # missing file -> Bench's adaptive retry is inert (by design
            # at soak scale); the host probe still reads the repo floor
            env["SPARK_GRAFT_WATERMARKS"] = os.path.join(scratch, ".no-watermarks")
        t0 = time.time()
        try:
            with open(log, "w") as lf:
                rc = subprocess.run([RUN, "graft.Bench", q], cwd=REPO, env=env,
                                    stdout=lf, stderr=subprocess.STDOUT,
                                    timeout=args.timeout).returncode
        except subprocess.TimeoutExpired:
            rc = -9
        wall = time.time() - t0
        ok = rc == 0 and os.path.exists(frag)
        if ok:
            d = json.load(open(frag))
            sec = d["queries"].get(q)
            ok = sec is not None and q not in d.get("failed", [])
            if sec is not None:
                merged[q] = sec
                passes[q] = d.get("passes", {}).get(q, [])
            hf = d.get("host_factor", 0)
            if hf and hf > 0:
                factors[q] = hf
        if not ok:
            failed.append(q)
            merged.setdefault(q, round(wall, 3))  # attempt duration, flagged
        status = "ok" if ok else f"FAILED rc={rc}"
        print(f"[sweep {i}/{len(queries)}] {q}: "
              f"{merged.get(q, float('nan')):.2f}s ({status}, fork {wall:.0f}s)",
              flush=True)

    out = {
        "metric": "total",
        "value": round(sum(s for q, s in merged.items() if q not in failed), 3),
        "unit": "sec",
        "method": "tools/soak_sweep.py: one fresh JVM per query "
                  "(graft.Bench single-query forks, min-of-2 cold in-JVM "
                  "passes), merged",
        "queries": {q: round(s, 3) for q, s in sorted(merged.items())},
        "passes": {q: passes.get(q, []) for q in sorted(merged)},
        "failed": sorted(failed),
        "suspect": [],
        "host_factor": round(max(factors.values()), 3) if factors else 0.0,
        "host_factors": {q: f for q, f in sorted(factors.items())},
        "sf": args.sf_dir,
        "cpus": args.cpus,
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: {len(merged)} queries, {len(failed)} failed, "
          f"wall {out['wall_sec']}s, worst fork host_factor {out['host_factor']}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
