#!/usr/bin/env python3
"""Fold dedicated new-query bench passes into the committed artifacts
(driver-side tooling, like make_soak_report.py).

Per the soak honesty rules: new queries get their own dual cold passes
at each scale point; their sf0.1 floors come from dedicated clean runs
at the code they shipped with, and nothing pre-change enters a minimum.

Usage:
  python3 tools/merge_new_soak.py --queries q1 q2 \
      --floors /tmp/wm_1.json /tmp/wm_2.json \
      --soak10 /tmp/s10_1.json /tmp/s10_2.json \
      --soak100 /tmp/s100_1.json /tmp/s100_2.json
Updates BENCH_WATERMARKS.json and BENCH_SOAK.json in place.
"""
import argparse
import json


def per_query_min(paths, names):
    best, src = {}, {}
    for p in paths:
        d = json.load(open(p))
        for q, sec in d["queries"].items():
            if q in names and (q not in best or sec < best[q]):
                best[q] = sec
                src[q] = p
    missing = set(names) - set(best)
    assert not missing, f"no bench entry for: {sorted(missing)}"
    return best, src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--floors", nargs="+", required=True)
    ap.add_argument("--soak10", nargs="+", required=True)
    ap.add_argument("--soak100", nargs="+", required=True)
    ap.add_argument("--host-note", default=None,
                    help="adjudication note required when the floors runs' "
                         "probe host_factor exceeds the disclosed 1.25 "
                         "threshold (WatermarkProvenanceSpec)")
    args = ap.parse_args()
    names = set(args.queries)

    # The probe's floor is EXEMPT from this tool: graft.Bench runs 5
    # warmup-discarded probe passes BEFORE the bench loop, so in any
    # floors run the probe query (and via Janino/JIT warmth, its early
    # neighbors) measures WARMER than the protocol the pre-r17 floors
    # were minted under. Re-minting q01 from such a run would lower its
    # floor and silently ratchet host_factor (= probe best / committed
    # q01 floor) upward on genuinely clean hosts. If the probe floor
    # ever needs re-minting, do it from a run whose probe measurement
    # is cold (a dedicated single-query run with the probe disabled)
    # and edit BENCH_WATERMARKS.json by hand with a host_note.
    probe = "q01_pricing_summary"
    if probe in names:
        raise SystemExit(
            f"refusing to re-mint the host-probe floor '{probe}': floors "
            "runs measure it warm (5 probe passes precede the bench loop), "
            "and a warm-minted probe floor ratchets host_factor upward on "
            "clean hosts. Mint it from a cold dedicated run by hand.")

    floors, floor_src = per_query_min(args.floors, names)
    # provenance stamp (r17): every minted floor carries the probe-
    # measured host factor of the RUN THAT SUPPLIED ITS MINIMUM (the
    # committed number's actual provenance — min-merging across spaced
    # runs on this bursty shared VM means different rows can come from
    # differently-elevated windows). A floors file without host_factor
    # predates the probe -- re-run graft.Bench rather than minting
    # unstamped floors.
    factor_of = {}
    for p in args.floors:
        d = json.load(open(p))
        hf = d.get("host_factor")
        assert hf is not None, (
            f"{p} has no host_factor -- re-run graft.Bench (it measures "
            "the probe first) before minting floors")
        assert hf > 0, (
            f"{p}: host_factor={hf} (probe floor unknown) -- cannot stamp "
            "provenance; fix the probe's committed floor first")
        factor_of[p] = hf
    hot = {q: factor_of[floor_src[q]] for q in floors
           if factor_of[floor_src[q]] > 1.25}
    if hot and not args.host_note:
        raise SystemExit(
            f"floors minted at host_factor > 1.25: "
            f"{ {q: round(h, 2) for q, h in sorted(hot.items())} } -- "
            "re-mint on a clean host, or pass --host-note to adjudicate")
    wm = json.load(open("BENCH_WATERMARKS.json"))
    for q, v in floors.items():
        row = {"floor": round(v, 3), "host": round(factor_of[floor_src[q]], 3)}
        if q in hot:
            row["host_note"] = args.host_note
        wm[q] = row
    with open("BENCH_WATERMARKS.json", "w") as f:
        json.dump(dict(sorted(wm.items())), f, indent=1)

    soak = json.load(open("BENCH_SOAK.json"))
    for key, paths in (("soak10x", args.soak10), ("soak100x", args.soak100)):
        best, _ = per_query_min(paths, names)
        block = soak[key]
        for q, sec in best.items():
            ent = {"sf0.1_sec": round(floors[q], 3), "soak_sec": round(sec, 3)}
            if floors[q] > 0:
                ent["ratio"] = round(sec / floors[q], 2)
            # bench-method stamp: 2 = toRdd.count() cold (r14 honesty
            # fix); rows measured under the pre-fix count() wrapper
            # carry 1 (or no stamp) and are known-stale
            ent["bench"] = 2
            # update in place, don't replace: a committed entry may
            # carry annotation keys (adjudication notes, stamps) that a
            # re-merge must not silently drop. The one key that must
            # NOT survive an update that omits it is "ratio": a stale
            # ratio computed against a previous floor would contradict
            # the freshly merged sf0.1_sec/soak_sec and poison
            # max_ratio below.
            entry = block["queries"].setdefault(q, {})
            if "ratio" not in ent:
                entry.pop("ratio", None)
            entry.update(ent)
        qs = block["queries"]
        block["n_queries"] = len(qs)
        block["total_sec"] = round(sum(e["soak_sec"] for e in qs.values()), 1)
        ratios = [e["ratio"] for e in qs.values() if "ratio" in e]
        block["max_ratio"] = max(ratios)
    with open("BENCH_SOAK.json", "w") as f:
        json.dump(soak, f, indent=1)
    print("merged", sorted(names))


if __name__ == "__main__":
    main()
