#!/usr/bin/env python3
"""Build the x100 sweep triage table: per-query engine wall (from dump
dir mtimes), sweep era (sequential vs 3-shard-contended), and oracle
disposition (from the incremental oracle log).

Usage: sweep_triage.py <vout_dir> <oracle_log> <out_json>
Era attribution: queries in shard*.txt completed under 3-way host
contention — their walls are upper bounds, not clean measurements; the
sequential era's walls are clean single-sweep numbers. Within an era,
wall(q) = mtime(q) - mtime(previous completion in the same process).
"""
import sys, os, json, re, glob

def main():
    vout, olog, outp = sys.argv[1], sys.argv[2], sys.argv[3]
    sweeps = os.path.dirname(vout)
    shard_of = {}
    for i in range(3):
        p = os.path.join(sweeps, f"shard{i}.txt")
        if os.path.exists(p):
            for n in open(p).read().strip().split(","):
                if n:
                    shard_of[n] = i
    dirs = []
    for d in sorted(glob.glob(f"{vout}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if os.path.exists(f"{d}/_SUCCESS"):
            dirs.append((name, os.path.getmtime(f"{d}/_SUCCESS")))
    # per-process completion chains: shard id, or "seq" for the
    # sequential era (not in any shard list)
    chains = {}
    for name, t in sorted(dirs, key=lambda x: x[1]):
        proc = shard_of.get(name, "seq")
        chains.setdefault(proc, []).append((name, t))
    walls = {}
    for proc, seq in chains.items():
        prev = None
        for name, t in seq:
            walls[name] = {
                "wall_s": round(t - prev, 1) if prev is not None else None,
                "era": "sharded" if proc != "seq" else "sequential",
            }
            prev = t
    # oracle dispositions
    disp = {}
    pat = re.compile(
        r"^(PASS|FAIL|ROWS|TIMEOUT|ERR)[ :]+(\w+)[: ]*(.*)$")
    if os.path.exists(olog):
        for line in open(olog):
            m = pat.match(line.strip())
            if m:
                disp[m.group(2)] = {"status": m.group(1),
                                    "detail": m.group(3)[:120]}
    out = {}
    for name, w in walls.items():
        out[name] = {**w, **disp.get(name, {"status": "UNCHECKED"})}
    for name, d in disp.items():
        if name not in out:
            out[name] = {"wall_s": None, "era": None, **d}
    json.dump(out, open(outp, "w"), indent=1, sort_keys=True)
    n = len(out)
    st = {}
    for v in out.values():
        st[v.get("status")] = st.get(v.get("status"), 0) + 1
    print(f"{n} queries: {st}")
    slow = sorted((v.get("wall_s") or 0, k) for k, v in out.items())[-15:]
    print("slowest engine walls (s):")
    for w, k in reversed(slow):
        print(f"  {k}: {w} ({out[k]['era']})")

if __name__ == "__main__":
    main()
