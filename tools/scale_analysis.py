#!/usr/bin/env python3
"""Compare a full-suite sf1 bench run against the sf0.1 per-query medians
and flag super-linear scalers.

The sf1 tables in benchdata/ are 10x the sf0.1 rows (self-similar copies,
consistent join keys — see make_scale.py), so a query that is linear in
its input should run at most ~10x its sf0.1 time PLUS the fixed
per-query floor (JVM/planning/stage-launch, ~0.2-0.5 s, which dominates
sub-second queries and drags their ratio far BELOW 10x). Queries on
fixed-size synthetic fixtures (SynthV2 grids, REST fixture, golden-
VALUES twins) don't scale with the dir at all and sit near 1x.

Flagging rule: ratio > FLAG_RATIO with an sf1 time above FLAG_ABS_SEC —
a sub-second query at 12x its 30 ms median is jitter, not a scaler.

Usage: python3 tools/scale_analysis.py [flag_ratio] [flag_abs_sec]
"""
import json
import statistics
import sys

FLAG_RATIO = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
FLAG_ABS_SEC = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0

base_runs = []
sf1_run = None
for line in open("bench_history.jsonl"):
    d = json.loads(line)
    if d.get("action") != "noop":
        continue
    if d.get("sf") == "/root/testdata/sf0.1":
        base_runs.append(d["queries"])
    elif d.get("sf") == "benchdata/sf1":
        sf1_run = d  # keep the newest

if sf1_run is None:
    sys.exit("no benchdata/sf1 run in bench_history.jsonl")

med = {}
for run in base_runs[-7:]:
    for k, v in run.items():
        if isinstance(v, (int, float)):
            med.setdefault(k, []).append(v)
med = {k: statistics.median(v) for k, v in med.items()}

rows = []
for name, t in sorted(sf1_run["queries"].items()):
    if t is None:
        rows.append((name, None, med.get(name), None, "FAILED"))
        continue
    b = med.get(name)
    ratio = t / b if b else None
    flag = ""
    if ratio is not None and ratio > FLAG_RATIO and t > FLAG_ABS_SEC:
        flag = "SUPER-LINEAR"
    rows.append((name, t, b, ratio, flag))

# suite ratio over the MATCHED set only: a failed-at-sf1 query must not
# leave its baseline in the denominator, nor a history-less query its
# sf1 time in the numerator
matched = [(t, b) for _, t, b, _, _ in rows if t is not None and b]
total_sf1 = sum(t for t, _ in matched)
total_base = sum(b for _, b in matched)
all_sf1 = sum(t for _, t, _, _, _ in rows if t is not None)
ratio_txt = (f"{total_sf1 / total_base:.2f}x" if total_base else "n/a")
print(f"sf1 total: {all_sf1:.1f} s over "
      f"{sum(1 for r in rows if r[1] is not None)} queries; matched-set "
      f"ratio {total_sf1:.1f}/{total_base:.1f} s = {ratio_txt} "
      f"for 10x rows ({len(matched)} queries in both)")
print(f"failures: {[r[0] for r in rows if r[4] == 'FAILED']}")
print()
flagged = [r for r in rows if r[4] == "SUPER-LINEAR"]
print(f"flagged super-linear (> {FLAG_RATIO}x and > {FLAG_ABS_SEC}s): "
      f"{len(flagged)}")
for name, t, b, ratio, _ in sorted(flagged, key=lambda r: -(r[3] or 0)):
    print(f"  {name}: {t:.2f}s vs median {b:.3f}s = {ratio:.1f}x")
print()
print("top 15 by absolute sf1 time:")
for name, t, b, ratio, flag in sorted(
        (r for r in rows if r[1] is not None), key=lambda r: -r[1])[:15]:
    rs = f"{ratio:.1f}x" if ratio else "n/a"
    print(f"  {name}: {t:.2f}s (sf0.1 median "
          f"{b:.3f}s, {rs}) {flag}" if b else f"  {name}: {t:.2f}s")
