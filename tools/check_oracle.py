#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet dump written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf
parquet tables, and compares: row count, column names (sorted), and
cell values (rows sorted, columns sorted by name). Exact equality for
ints/strings; doubles compared exactly first, then with rel-tol 1e-12
reported separately so hash-risk is visible.

ORACLE_TIMEOUT_S (env, optional): per-query watchdog for scale sweeps —
some twins are deliberately join-form differential oracles whose DuckDB
cost explodes at 10x rows (that cost is why the Spark scan forms
exist). A timed-out twin is reported as TIMEOUT, counted separately,
and never counted as pass or fail. Unset (the driver's gate) = no
timeout, identical behavior to before.
"""
import sys, json, glob, os, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # optional thread cap so a scale sweep can run capped alongside other
    # work; unset (the driver's gate) = DuckDB default, behavior unchanged
    nthreads = os.environ.get("DUCKDB_THREADS")
    if nthreads:
        con.execute(f"SET threads={int(nthreads)}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0") or 0)

    def run_oracle(sql):
        """Execute with an optional interrupt watchdog; returns
        (df, timed_out).

        Race guard (r13 ADVICE): if the query finishes right at the
        deadline, the timer can interrupt AFTER fetchdf returned but
        before cancel — the interrupt then aborts the NEXT query, which
        would be misreported as an oracle SQL error. The timer sets an
        Event before interrupting, so an InterruptException counts as
        TIMEOUT only when THIS query's timer flagged it (a stale one is
        retried once); after a flagged-but-successful run the pending
        interrupt is drained so it can't leak into the next query."""
        if timeout_s <= 0:
            return con.execute(sql).fetchdf(), False
        for _attempt in range(2):
            fired = threading.Event()
            def _interrupt():
                fired.set()
                con.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
            try:
                df = con.execute(sql).fetchdf()
                return df, False
            except duckdb.InterruptException:
                if fired.is_set():
                    return None, True
                continue  # stale interrupt from a prior query: retry once
            finally:
                timer.cancel()
                timer.join()  # ensure _interrupt isn't mid-flight
                if fired.is_set():
                    try:
                        con.execute("SELECT 1")
                    except duckdb.InterruptException:
                        pass  # drained the late interrupt
        raise RuntimeError("two unflagged interrupts in a row")

    n_pass = n_fail = n_noq = n_to = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM parquet_scan({files!r})").fetchdf()
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got)} (no oracle)"); n_noq += 1
            continue
        try:
            exp, timed_out = run_oracle(oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if timed_out:
            print(f"TIMEOUT {name}: oracle exceeded {timeout_s:.0f}s "
                  f"(spark rows={len(got)})")
            n_to += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: cols {gc} vs {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1
            continue
        import numpy as np
        def norm(df):
            df = df.copy()
            for c in df.columns:
                if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                    df[c] = df[c].map(lambda v: tuple(v) if v is not None
                                      and not (isinstance(v, float)) else v)
            return df
        g = norm(got[gc]).sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        e = norm(exp[ec]).sort_values(by=ec, kind="mergesort").reset_index(drop=True)
        # Dtype-class guard: the driver hashes value REPRS, so an int64
        # Spark column against a float64 oracle column ("1" vs "1.0")
        # hash-fails even when every value compares equal below. DuckDB
        # silently produces this via HUGEINT (sum of ints) -> pandas
        # float64 — the r10 w5_sessionize red cell. Surface it loudly.
        dt_mism = [(c, str(g[c].dtype), str(e[c].dtype)) for c in gc
                   if (str(g[c].dtype).startswith(("int", "uint")) !=
                       str(e[c].dtype).startswith(("int", "uint")))
                   and "object" not in (str(g[c].dtype), str(e[c].dtype))]
        if dt_mism:
            print(f"FAIL {name}: int/float dtype class mismatch "
                  f"(hash-risk): {dt_mism}")
            n_fail += 1
            continue
        mism = []
        near = []
        for c in gc:
            gv, ev = g[c], e[c]
            for i in range(len(gv)):
                a, b = gv.iloc[i], ev.iloc[i]
                if a is None and b is None:
                    continue
                if isinstance(a, float) or isinstance(b, float):
                    if a != b and not (a != a and b != b):
                        scale = max(abs(a or 0.0), abs(b or 0.0), 1e-300)
                        if a is not None and b is not None and \
                                abs(a - b) / scale < 1e-12:
                            near.append((c, i, a, b))
                        else:
                            mism.append((c, i, a, b))
                elif hasattr(a, "__len__") and not isinstance(a, str):
                    if list(a) != list(b):
                        mism.append((c, i, a, b))
                elif a != b:
                    mism.append((c, i, a, b))
                if len(mism) > 3:
                    break
            if len(mism) > 3:
                break
        if mism:
            print(f"FAIL {name}: value mismatches (first): {mism[:3]}")
            n_fail += 1
        elif near:
            # within rel-tol 1e-12 but NOT bit-identical: would fail a
            # hash compare - surfaced loudly so float-parity rot is visible
            print(f"FAIL {name}: {len(near)} values within 1e-12 but not "
                  f"exact (hash-risk), first: {near[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
    summary = f"== {n_pass} pass, {n_fail} fail, {n_noq} rows-only =="
    if n_to:
        summary = (f"== {n_pass} pass, {n_fail} fail, {n_noq} rows-only, "
                   f"{n_to} oracle-timeout ==")
    print(summary)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
