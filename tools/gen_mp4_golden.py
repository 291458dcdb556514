#!/usr/bin/env python3
"""Cross-derive the mm_mp4_metadata golden VALUES independently of the
JVM: re-implement SynthAssets.mix/nonneg (splitmix-style 64-bit mixing)
and the id->(width, height, duration_ms) derivation in python, WITHOUT
going through the container bytes — the engine must produce the same
numbers via real BMFF mux + parse, so a bug in either the muxer or the
walker breaks the hash match.

Usage: gen_mp4_golden.py <sf_dir>   # prints the VALUES list
"""
import sys
import duckdb

M = (1 << 64) - 1


def mix(i, salt):
    x = (i * 0x9E3779B97F4A7C15 + salt) & M
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & M
    x ^= x >> 33
    return x


def signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def nonneg(x):
    s = signed(x)
    if s == -(1 << 63):  # JVM abs(Long.MinValue) stays negative -> clamp
        return 0
    return abs(s)


def meta(asset_id):
    m = mix(asset_id, 4)
    w = 160 + (nonneg(m) % 8) * 16
    h = 96 + ((m >> 8) % 6) * 16
    dur = 1000 + (m >> 16) % 60000
    return w, h, dur


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{sf}/documents.parquet' "
        "WHERE doc_id % 7 = 0 ORDER BY doc_id").fetchall()]
    rows = []
    for i in ids:
        w, h, d = meta(i)
        rows.append(f"({i}, {w}, {h}, {d})")
    print(", ".join(rows))
    print(f"-- {len(rows)} assets", file=sys.stderr)


if __name__ == "__main__":
    main()
