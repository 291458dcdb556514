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


def features(asset_id):
    """Cross-derive mm_mp4_features: replicate the SynthAssets sample
    table (stsz sizes + stss cadence) and the mp4Features stats
    arithmetic, float32-narrowed exactly as the JVM kernel stores them,
    then Spark-round (HALF_UP on the exact binary double)."""
    import numpy as np
    from decimal import Decimal, ROUND_HALF_UP

    def f32(x):
        return float(np.float32(x))

    def spark_round(x, p=4):
        q = Decimal(x).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP)
        return format(q, 'f')

    ms = mix(asset_id, 6)
    n = 8 + (ms >> 4) % 25
    sync_step = 2 + (ms >> 12) % 6
    sizes = [200 + nonneg(mix(asset_id, 64 + j)) % 800 for j in range(n)]
    syncs = list(range(1, n + 1, sync_step))
    mean = sum(sizes) / n
    sq = 0.0
    for s in sizes:
        sq += float(s) * float(s)
    std = (max(sq / n - mean * mean, 0.0)) ** 0.5
    import math as _m
    def bucket(k, buckets=8):
        lo, hi = k * n // buckets, (k + 1) * n // buckets
        if hi <= lo:
            return 0.0
        acc = 0.0
        for j in range(lo, hi):
            acc += sizes[j]
        return f32(_m.log1p(acc / (hi - lo)))
    return (n, spark_round(f32(len(syncs) / n)), spark_round(f32(mean)),
            spark_round(f32(std)), spark_round(bucket(0)),
            spark_round(bucket(7)))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    feat = "--features" in sys.argv
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{sf}/documents.parquet' "
        "WHERE doc_id % 7 = 0 ORDER BY doc_id").fetchall()]
    rows = []
    for i in ids:
        if feat:
            n, sr, mn, sd, b1, b8 = features(i)
            rows.append(f"({i}, {n}, {sr}, {mn}, {sd}, {b1}, {b8})")
        else:
            w, h, d = meta(i)
            rows.append(f"({i}, {w}, {h}, {d})")
    print(", ".join(rows))
    print(f"-- {len(rows)} assets", file=sys.stderr)


if __name__ == "__main__":
    main()
