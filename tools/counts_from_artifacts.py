#!/usr/bin/env python3
"""Derive the doc-facing counts from the DRIVER's artifacts, not a local
sweep (round-10 verdict #2: README said 188 hash-green / 136 s while the
shipped CORRECTNESS_r10/BENCH_r10 said 187 / 155.3 s — counts must come
from the official record).

Usage: counts_from_artifacts.py [repo_dir]
Prints the latest round's: query total, hash-green, rows-only(no_oracle),
hash-fail (named), and the shipped bench total.
"""
import glob, json, os, re, sys


def latest(pattern, d):
    # rank by the ROUND number specifically: concatenating every digit
    # in the name would let a suffixed file (..._r11_sf0.01.json ->
    # "11001") permanently outrank the real latest round
    files = [(m, f) for f in glob.glob(os.path.join(d, pattern))
             for m in [re.search(r"_r(\d+)", os.path.basename(f))] if m]
    if not files:
        return None
    return max(files, key=lambda mf: int(mf[0].group(1)))[1]


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "."
    corr_f = latest("CORRECTNESS_r*.json", d)
    bench_f = latest("BENCH_r*.json", d)
    if corr_f:
        corr = json.load(open(corr_f))
        green = [q for q, r in corr.items()
                 if r.get("hash_match") is True and r.get("rows_match") is True
                 and r.get("schema_match") is True]
        noq = [q for q, r in corr.items() if r.get("err") == "no_oracle"]
        fail = [q for q, r in corr.items()
                if r.get("err") != "no_oracle" and not (
                    r.get("hash_match") and r.get("rows_match")
                    and r.get("schema_match"))]
        print(f"correctness: {os.path.basename(corr_f)}")
        print(f"  queries total : {len(corr)}")
        print(f"  hash-green    : {len(green)}")
        print(f"  rows-only     : {len(noq)} {sorted(noq)}")
        print(f"  fail          : {len(fail)} {sorted(fail)}")
    if bench_f:
        raw = open(bench_f).read().replace('\\"', '"')
        # the driver keeps only the TAIL of the bench line, so prefer the
        # end-stamped total; fall back to summing the per-query entries
        # that survived truncation (a lower bound, flagged as such)
        m = (re.search(r'"value_end":([0-9.]+)', raw)
             or re.search(r'"metric":"total_ok","value":([0-9.]+)', raw))
        n_ok = re.search(r'"n_ok":(\d+)', raw)
        print(f"bench: {os.path.basename(bench_f)}")
        if m:
            print(f"  total_ok sec  : {float(m.group(1)):.1f}")
        else:
            reserved = {"value", "n_ok", "n_fail", "sf", "action",
                        "value_end"}
            qsum = sum(float(v) for k, v in
                       re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', raw)
                       if k not in reserved)
            print(f"  total_ok sec  : >= {qsum:.1f} (summed from truncated"
                  " tail; no end-stamped total in this round's artifact)")
        if n_ok:
            print(f"  n_ok          : {n_ok.group(1)}")


if __name__ == "__main__":
    main()
