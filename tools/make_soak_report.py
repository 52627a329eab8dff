#!/usr/bin/env python3
"""Assemble BENCH_SOAK.json from soak bench runs (driver-side tooling).

Inputs: one or more BENCH_FULL-shaped JSON files per scale point (the
per-query min across files is taken — run graft.Bench with
SPARK_GRAFT_BENCH_FULL pointed at a scratch path, twice per scale), plus
BENCH_WATERMARKS.json for the sf0.1 floors.

Usage:
  python3 tools/make_soak_report.py \
      --soak10 /tmp/soak10_a.json /tmp/soak10_b.json \
      --soak100 /tmp/soak100_a.json /tmp/soak100_b.json \
      --note "..." > BENCH_SOAK.json
"""
import argparse
import json


def load_min(paths):
    """Per-query min seconds + union of failed across runs."""
    best, failed = {}, set()
    for p in paths:
        d = json.load(open(p))
        for q, sec in d["queries"].items():
            if q not in best or sec < best[q]:
                best[q] = sec
        failed |= set(d.get("failed", []))
    return best, sorted(failed)


def scale_block(paths, floors):
    best, failed = load_min(paths)
    qs = {}
    for q in sorted(best):
        floor = floors.get(q)
        ent = {"sf0.1_sec": round(floor, 3) if floor is not None else None,
               "soak_sec": round(best[q], 3)}
        # `is not None`: a legitimate 0.0 watermark must not read as missing
        if floor is not None and floor > 0:
            ent["ratio"] = round(best[q] / floor, 2)
        qs[q] = ent
    ratios = [e["ratio"] for e in qs.values() if "ratio" in e]
    return {
        "n_queries": len(best),
        "total_sec": round(sum(best.values()), 1),
        "failed": failed,
        "max_ratio": max(ratios) if ratios else None,
        "queries": qs,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--soak10", nargs="+", required=True)
    ap.add_argument("--soak100", nargs="+", required=True)
    ap.add_argument("--watermarks", default="BENCH_WATERMARKS.json")
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    floors = {q: (v["floor"] if isinstance(v, dict) else v)
              for q, v in json.load(open(args.watermarks)).items()}
    out = {
        "metric": "scale_soak",
        "data": ("tools/make_soak_data.py: key-shifted copies of sf0.1 "
                 "preserving join fan-out, per-key density, and per-doc dup "
                 "structure (per-document length-proportional text "
                 "perturbation keeps copies mutually distinct — growth means "
                 "MORE documents, not denser duplication). 10x: lineitem 6M "
                 "rows; 100x: lineitem 60M, events 10M, orders 15M, "
                 "documents 500k, embeddings 200k."),
        "method": ("graft.Bench min-of-2+ passes per scale point, local[32] "
                   "(driver heap 16g at 10x, 48g at 100x; cache cleared "
                   "between passes, so minima are cold); sf0.1 side = "
                   "clean-run per-query minima (BENCH_WATERMARKS.json)"),
        "soak10x": scale_block(args.soak10, floors),
        "soak100x": scale_block(args.soak100, floors),
        "note": args.note,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
