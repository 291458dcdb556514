#!/usr/bin/env python3
"""Build scaled-up documents tables for local scaling measurements.

Each copy of sf0.1 gets a distinct seeded 26-letter permutation applied
via translate(): a per-copy bijection on characters preserves the
within-copy duplicate/shingle structure exactly (shingle sets map 1:1)
while making text across copies mutually dissimilar, so the corpus
scales the way a genuinely larger crawl would — same dup rate, larger n,
larger vocabulary. doc_id is offset per copy; n_chars is preserved
(translate is length-preserving).

Output goes under benchdata/ (gitignored). Usage:
    python3 tools/make_scale.py sf1 10
    python3 tools/make_scale.py sf10 100
"""
import duckdb
import os
import random
import string
import sys

SRC = "/root/testdata/sf0.1/documents.parquet"
EMB = "/root/testdata/sf0.1/embeddings.parquet"
N = duckdb.sql(f"SELECT count(*) FROM '{SRC}'").fetchone()[0]
NE = duckdb.sql(f"SELECT count(*) FROM '{EMB}'").fetchone()[0]
DIM = duckdb.sql(f"SELECT len(embedding) FROM '{EMB}' LIMIT 1").fetchone()[0]


def perm(i: int) -> str:
    if i == 0:
        return string.ascii_lowercase
    rng = random.Random(42 + i)
    letters = list(string.ascii_lowercase)
    rng.shuffle(letters)
    return "".join(letters)


def emb_expr(i: int) -> str:
    """Per-copy signed dimension permutation: an orthogonal transform, so
    within-copy cosines/norms are preserved exactly while cross-copy
    vectors decorrelate (copy 0 stays the identity)."""
    if i == 0:
        return "embedding"
    rng = random.Random(1042 + i)
    order = list(range(1, DIM + 1))
    rng.shuffle(order)
    signs = [rng.choice((-1, 1)) for _ in range(DIM)]
    parts = ", ".join(
        f"(embedding[{p}] * {s1})::FLOAT" for p, s1 in zip(order, signs)
    )
    return f"[{parts}]"


def build(name: str, copies: int) -> None:
    out = f"benchdata/{name}"
    os.makedirs(out, exist_ok=True)
    selects = []
    for i in range(copies):
        p = perm(i).replace("'", "''")
        selects.append(
            f"SELECT doc_id + {i * N} AS doc_id, "
            f"translate(text, 'abcdefghijklmnopqrstuvwxyz', '{p}') AS text, "
            f"lang, source, n_chars FROM src"
        )
    q = (
        f"COPY (WITH src AS (SELECT * FROM '{SRC}') "
        + " UNION ALL ".join(selects)
        + f") TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(q)
    got = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM '{out}/documents.parquet'"
    ).fetchone()
    assert got[0] == got[1] == N * copies, got
    print(f"{name}: {got[0]} docs -> {out}/documents.parquet")

    # vec_id is offset by i*N (the DOCUMENT stride, not i*NE): the fixture
    # joins doc_id = vec_id, so each copy's vectors must keep joining their
    # own copy's (identically permuted) documents. Ids need not be dense.
    eselects = [
        f"SELECT vec_id + {i * N} AS vec_id, {emb_expr(i)} AS embedding, "
        f"label FROM esrc"
        for i in range(copies)
    ]
    eq = (
        f"COPY (WITH esrc AS (SELECT * FROM '{EMB}') "
        + " UNION ALL ".join(eselects)
        + f") TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(eq)
    egot = duckdb.sql(
        f"SELECT count(*), count(DISTINCT vec_id) FROM '{out}/embeddings.parquet'"
    ).fetchone()
    assert egot[0] == egot[1] == NE * copies, egot
    print(f"{name}: {egot[0]} vecs -> {out}/embeddings.parquet")


EVT = "/root/testdata/sf0.1/events.parquet"


def build_events(name: str, copies: int) -> None:
    """Scaled events for streaming-state measurements: each copy offsets
    user_id (and event_id) while keeping ts untouched, so the per-user
    session/timer structure of every copy is identical to the base and
    the scale axis is KEY CARDINALITY — the axis streaming state (one
    open session + one timer per key) actually grows along. The time
    horizon stays fixed, as it does for a real service adding users."""
    out = f"benchdata/{name}"
    stats = duckdb.sql(
        f"SELECT count(*), max(user_id) + 1, max(event_id) + 1 FROM '{EVT}'"
    ).fetchone()
    nv, ustride, estride = stats
    selects = [
        f"SELECT event_id + {i * estride} AS event_id, ts, "
        f"user_id + {i * ustride} AS user_id, event_type, value, props "
        f"FROM vsrc"
        for i in range(copies)
    ]
    q = (
        f"COPY (WITH vsrc AS (SELECT * FROM '{EVT}') "
        + " UNION ALL ".join(selects)
        + f") TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(q)
    got = duckdb.sql(
        f"SELECT count(*), count(DISTINCT event_id) FROM '{out}/events.parquet'"
    ).fetchone()
    assert got[0] == got[1] == nv * copies, got
    print(f"{name}: {got[0]} events -> {out}/events.parquet")


def build_tpch(name: str, copies: int) -> None:
    """Scaled TPC-H-ish tables with CONSISTENT key offsets: every copy is
    a self-similar shard (its lineitem joins its orders joins its
    customers), so join fan-out and selectivity are preserved exactly and
    a full-suite run at the scaled size measures the linear-growth axis,
    not a distorted join graph. nation/region stay fixed small dims —
    the realistic 100 TB shape, where dimension tables remain
    broadcast-sized while facts grow. Key strides are the dense [0, N)
    key ranges (asserted dense at the source).

    Sole owner of orders.parquet (the retired docs-mode builder offset
    only o_orderkey, leaving o_custkey pointing at copy-0 customers —
    keys still resolved, so nothing errored, but the orders-per-customer
    fan-out was silently x`copies`)."""
    out = f"benchdata/{name}"
    os.makedirs(out, exist_ok=True)
    d = "/root/testdata/sf0.1"
    strides = {}
    for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("supplier", "s_suppkey"), ("part", "p_partkey")]:
        lo, hi, n = duckdb.sql(
            f"SELECT min({k}), max({k}), count(*) FROM '{d}/{t}.parquet'"
        ).fetchone()
        assert lo == 0 and hi == n - 1, (t, k, lo, hi, n)
        strides[t] = n

    def scaled(table: str, repl: dict, pk: str = None) -> None:
        reps = ", ".join(f"{c} + {{i}}*{s} AS {c}" for c, s in repl.items())
        selects = [
            f"SELECT * REPLACE ({reps.format(i=i)}) FROM src"
            for i in range(copies)
        ]
        q = (
            f"COPY (WITH src AS (SELECT * FROM '{d}/{table}.parquet') "
            + " UNION ALL ".join(selects)
            + f") TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        duckdb.sql(q)
        base_n = duckdb.sql(
            f"SELECT count(*) FROM '{d}/{table}.parquet'").fetchone()[0]
        n = duckdb.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        # a wrong stride would collide copies' keys — and the referential
        # spot-checks below CANNOT see it (collided fact keys still
        # resolve in the equally-collided dimension), so assert key
        # uniqueness here, where the collision actually happens
        assert n == base_n * copies, (table, n, base_n, copies)
        if pk is not None:
            dk = duckdb.sql(
                f"SELECT count(DISTINCT {pk}) FROM '{out}/{table}.parquet'"
            ).fetchone()[0]
            assert dk == n, (table, pk, dk, n)
        print(f"{name}: {n} rows -> {out}/{table}.parquet")

    no, nc, ns, np_ = (strides["orders"], strides["customer"],
                       strides["supplier"], strides["part"])
    scaled("customer", {"c_custkey": nc}, pk="c_custkey")
    scaled("supplier", {"s_suppkey": ns}, pk="s_suppkey")
    scaled("part", {"p_partkey": np_}, pk="p_partkey")
    scaled("orders", {"o_orderkey": no, "o_custkey": nc}, pk="o_orderkey")
    scaled("lineitem", {"l_orderkey": no, "l_partkey": np_,
                        "l_suppkey": ns})  # no single-column pk
    for dim in ("nation", "region"):
        duckdb.sql(
            f"COPY (SELECT * FROM '{d}/{dim}.parquet') "
            f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)"
        )
        print(f"{name}: {dim} copied verbatim (fixed dim)")
    # referential spot-checks: every fact key resolves in its dimension
    for fact, fk, dim, dk in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]:
        dangling = duckdb.sql(
            f"SELECT count(*) FROM '{out}/{fact}.parquet' f "
            f"WHERE {fk} IS NOT NULL AND NOT EXISTS (SELECT 1 FROM "
            f"'{out}/{dim}.parquet' d WHERE d.{dk} = f.{fk})"
        ).fetchone()[0]
        assert dangling == 0, (fact, fk, dangling)
    print(f"{name}: referential integrity OK")


if __name__ == "__main__":
    # orders is owned by build_tpch ALONE (r13): the old docs-mode
    # builder offset only o_orderkey, leaving every copy's o_custkey
    # pointing at copy-0 customers — a silently 10x-skewed join graph
    # that nothing would catch (the keys still resolve)
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    if which not in ("all", "docs", "tpch"):
        # a typo'd mode must not exit 0 having built nothing — a sweep
        # against stale/absent benchdata would look like a clean build
        sys.exit(f"make_scale.py: unknown mode {which!r} "
                 f"(expected all|docs|tpch)")
    if which in ("all", "docs"):
        build(sys.argv[1], int(sys.argv[2]))
        build_events(sys.argv[1], int(sys.argv[2]))
    if which in ("all", "tpch"):
        build_tpch(sys.argv[1], int(sys.argv[2]))
