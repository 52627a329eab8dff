#!/usr/bin/env python3
"""One-time migration (r17): BENCH_WATERMARKS.json rows go from flat
{"name": seconds} to {"name": {"floor": seconds, "host": factor}} so
every floor can carry the host factor it was minted under (the r16
elevation audit found the whole host running 1.5-1.9x hot for a
stretch; a floor minted inside such a window got an elevated watermark
with nothing recording it).

"host" semantics:
  > 0  -- the probe-measured host factor at mint time (graft.Bench now
          runs Bench.ProbeQuery against sf0.1 first and emits
          host_factor in BENCH_FULL.json; tools/merge_new_soak.py
          stamps it onto every floor it mints; a factor above the
          disclosed 1.25 threshold requires an explicit host_note).
  == 0 -- pre-probe sentinel: the floor predates the probe (minted
          r1-r16). These are NOT blessed as clean by this migration --
          the stamp records only "provenance unknown, predates the
          instrument". The r16 verdict's independent 11-pass elevation
          audit retained all then-committed floors as clean-host, which
          is the best evidence that exists for them; see VERDICT.md
          (r16) "Floor provenance under host elevation".

WatermarkProvenanceSpec enforces the format, the threshold, and that
the pre-probe sentinel set can only shrink (it is frozen to the r17
migration set committed in tools/preprobe_floors.txt -- a NEW floor can
never claim the sentinel).
"""
import json

wm = json.load(open("BENCH_WATERMARKS.json"))
migrated = {}
names = []
for q, v in sorted(wm.items()):
    if isinstance(v, dict):  # already nested (idempotent re-run)
        migrated[q] = v
        if v.get("host", -1) == 0:
            names.append(q)
    else:
        migrated[q] = {"floor": v, "host": 0}
        names.append(q)
with open("BENCH_WATERMARKS.json", "w") as f:
    json.dump(migrated, f, indent=1)
with open("tools/preprobe_floors.txt", "w") as f:
    f.write("\n".join(names) + "\n")
print(f"migrated {len(names)} pre-probe rows; froze the sentinel set "
      f"in tools/preprobe_floors.txt")
