#!/usr/bin/env python
"""Generate an sf1.0-equivalent test-data directory by deterministic
x10 inflation of the driver's sf0.1 tables (TESTDATA.md — which is
read-only; this writes elsewhere, default /tmp/sf1.0).

Why inflation instead of re-running a generator: the driver's generator
is not in the repo, and the scale experiment (SCALE.md "one decade up")
needs data with the SAME schema and the same per-key statistical shape
at 10x the volume — key-shifted replication gives exactly that:

- dimensions ``region``/``nation`` are fixed-size and copied verbatim;
- ``customer``/``supplier``/``part`` replicate 10x with primary keys
  shifted by ``rep * (max_key + 1)``, so per-key cardinalities are
  preserved and FK joins stay 1:N exactly as at sf0.1;
- ``orders``/``lineitem`` shift their own keys AND every FK by the
  matching stride, so the star schema stays referentially intact;
- ``events`` replicates with shifted ``event_id``/``user_id`` and
  IDENTICAL timestamps — 10x concurrency per instant, the realistic
  way an event feed grows (sessions per user unchanged);
- ``documents`` keeps rep 0 verbatim and word-shuffles reps 1-9 with a
  per-(doc_id, rep) md5-seeded order — cross-rep texts share no
  3-shingles, so near-dup structure scales LINEARLY (each rep
  reproduces sf0.1's intra-rep dup pairs) instead of the quadratic
  blow-up a naive text copy would cause; exact-dup structure is
  likewise preserved per rep and never created across reps;
- ``embeddings`` rotates each vector by ``rep`` positions (norms and
  pairwise-within-rep geometry preserved; cross-rep vectors decorrelate).

Everything is seed-free and deterministic (md5 of ids), so the
artifact regenerates bit-identically.

Usage: python tools/make_sf1.py [outdir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10


def q(path: str) -> str:
    return f"read_parquet('{path}')"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(generate_series(0, {REPS - 1})) AS rep")

    def schema_of(path: str) -> list[tuple[str, str]]:
        return [
            (r[0], r[1])
            for r in con.execute(f"DESCRIBE SELECT * FROM {q(path)}").fetchall()
        ]

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        # Structural guard against generator column leaks (the r9 `rep`
        # bug class): every output table must carry EXACTLY the sf0.1
        # source's column names and types — order-insensitive because
        # the key-shift SELECTs reorder the shifted keys to the front.
        src = sorted(schema_of(f"{SRC}/{name}.parquet"))
        got = sorted(schema_of(f"{out}/{name}.parquet"))
        assert got == src, (
            f"{name}: inflated schema diverges from sf0.1 source:\n"
            f"  source: {src}\n  output: {got}"
        )
        print(f"{name}: {n} rows (schema == sf0.1)")

    # fixed dimensions: verbatim
    for t in ("region", "nation"):
        copy(f"SELECT * FROM {q(f'{SRC}/{t}.parquet')}", t)

    # key strides (max+1 so shifted ranges never collide)
    strides = {}
    for t, k in (
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
    ):
        strides[t] = (
            con.execute(
                f"SELECT max({k}) + 1 FROM {q(f'{SRC}/{t}.parquet')}"
            ).fetchone()[0]
        )
    strides["user"] = (
        con.execute(
            f"SELECT max(user_id) + 1 FROM {q(f'{SRC}/events.parquet')}"
        ).fetchone()[0]
    )

    copy(
        f"""SELECT c_custkey + rep * {strides['customer']} AS c_custkey,
                   * EXCLUDE (c_custkey, rep)
            FROM {q(f'{SRC}/customer.parquet')}, reps""",
        "customer",
    )
    copy(
        f"""SELECT s_suppkey + rep * {strides['supplier']} AS s_suppkey,
                   * EXCLUDE (s_suppkey, rep)
            FROM {q(f'{SRC}/supplier.parquet')}, reps""",
        "supplier",
    )
    copy(
        f"""SELECT p_partkey + rep * {strides['part']} AS p_partkey,
                   * EXCLUDE (p_partkey, rep)
            FROM {q(f'{SRC}/part.parquet')}, reps""",
        "part",
    )
    copy(
        f"""SELECT o_orderkey + rep * {strides['orders']} AS o_orderkey,
                   o_custkey + rep * {strides['customer']} AS o_custkey,
                   * EXCLUDE (o_orderkey, o_custkey, rep)
            FROM {q(f'{SRC}/orders.parquet')}, reps""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + rep * {strides['orders']} AS l_orderkey,
                   l_partkey + rep * {strides['part']} AS l_partkey,
                   l_suppkey + rep * {strides['supplier']} AS l_suppkey,
                   * EXCLUDE (l_orderkey, l_partkey, l_suppkey, rep)
            FROM {q(f'{SRC}/lineitem.parquet')}, reps""",
        "lineitem",
    )
    copy(
        f"""SELECT event_id + rep * {strides['events']} AS event_id,
                   user_id + rep * {strides['user']} AS user_id,
                   * EXCLUDE (event_id, user_id, rep)
            FROM {q(f'{SRC}/events.parquet')}, reps""",
        "events",
    )

    # documents: rep 0 verbatim; reps 1-9 word-shuffled (deterministic
    # per (doc_id, rep) md5 sort key), n_chars recomputed
    docs = con.execute(
        f"SELECT doc_id, text, lang, source FROM {q(f'{SRC}/documents.parquet')} ORDER BY doc_id"
    ).fetchall()
    d_stride = max(d[0] for d in docs) + 1
    rows = []
    for rep in range(REPS):
        for doc_id, text, lang, source in docs:
            if rep == 0:
                t = text
            else:
                words = text.split(" ")
                words.sort(
                    key=lambda w, _r=rep, _d=doc_id: hashlib.md5(
                        f"{_d}|{_r}|{w}".encode()
                    ).hexdigest()
                )
                t = " ".join(words)
            rows.append((doc_id + rep * d_stride, t, lang, source, len(t)))
    con.execute(
        "CREATE TABLE docs1 (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs1 VALUES (?,?,?,?,?)", rows)
    copy("SELECT * FROM docs1 ORDER BY doc_id", "documents")

    # embeddings: rotate each 64-dim vector by rep positions
    v_stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM {q(f'{SRC}/embeddings.parquet')}"
    ).fetchone()[0]
    copy(
        f"""SELECT vec_id + rep * {v_stride} AS vec_id,
                   CASE WHEN rep = 0 THEN embedding
                        ELSE embedding[rep + 1:] || embedding[1:rep]
                   END AS embedding,
                   label
            FROM {q(f'{SRC}/embeddings.parquet')}, reps""",
        "embeddings",
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
