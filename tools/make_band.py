#!/usr/bin/env python3
"""Regenerate BENCH_BAND.json — the banked per-query NORMALIZED medians
the bench's band_drift check compares against (Bench.scala).

Usage: python3 tools/make_band.py <trusted BENCH artifact> [out.json]

The source must be a full bench artifact (queries + box_factor) from a
trusted run at the ROUND scale (sf0.1 — the scale the driver measures).
Each banked figure is median / box_factor; the run's sf is stamped as
"_sf" so a bench at a different scale skips the check instead of
false-flagging. Re-bank deliberately (after a root-caused improvement
lands), never automatically — a band that follows the measurements can
never catch a steady drift.
"""
import json
import re
import sys

src = json.load(open(sys.argv[1]))
bf = src.get("box_factor") or 1.0
band = {k: round(v / bf, 6) for k, v in src["queries"].items() if v >= 0}
m = re.search(r"sf([0-9.]+)/?$", str(src.get("sf", "")))
if m:
    band["_sf"] = float(m.group(1))
out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BAND.json"
with open(out, "w") as f:
    json.dump(band, f, indent=0, sort_keys=True)
    f.write("\n")
print(f"wrote {out}: {len(band)} entries, box_factor {bf}, sf {band.get('_sf')}",
      file=sys.stderr)
