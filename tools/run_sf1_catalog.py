#!/usr/bin/env python
"""Run the FULL query catalog through the driver's gate protocol at
sf1.0 (VERDICT r9 item 3: the decade gate covered a 42-query
cross-section; the other 183 had never run above sf0.1 — and the r9
cross-section caught a real generator bug on its first pass).

Batches the catalog through ``parity_sweep.py`` in fixed-size chunks
(bounded blast radius: one pathological query can time out its chunk
without killing the campaign), re-runs a timed-out chunk's queries
one at a time so only the genuinely stuck query is marked, then merges
every chunk artifact into ``CORRECTNESS_LOCAL_SF1.json`` with the same
row format the driver writes.

Usage:
    python tools/run_sf1_catalog.py [--chunk N] [--timeout SEC]

Environment: SF1_DIR (default /tmp/sf1.0) must exist — build it with
``python tools/make_sf1.py`` first.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.get("SF1_DIR", "/tmp/sf1.0")
OUT = os.path.join(REPO, "CORRECTNESS_LOCAL_SF1.json")
CHUNK_DIR = "/tmp/sf1_chunks"


def catalog_names() -> list[str]:
    from gee_datapipeline_spark.plans import queries

    return sorted(queries())


def run_chunk(names: list[str], out_path: str, timeout: int) -> bool:
    """One parity_sweep subprocess over ``names``; True if it finished
    (pass or fail — a nonzero exit with an artifact still counts as
    finished; only a timeout/no-artifact counts as not finished)."""
    env = dict(
        os.environ,
        PARITY_SF_DIR=SF1_DIR,
        PARITY_ONLY=",".join(names),
        PARITY_OUT=out_path,
        PARITY_DRIVER_MEM=os.environ.get("PARITY_DRIVER_MEM", "16g"),
    )
    try:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "parity_sweep.py")],
            env=env,
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except subprocess.TimeoutExpired:
        return os.path.exists(out_path)
    return os.path.exists(out_path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--solo-timeout", type=int, default=900)
    args = ap.parse_args()

    if not os.path.isdir(SF1_DIR):
        sys.exit(f"{SF1_DIR} missing - run tools/make_sf1.py first")
    os.makedirs(CHUNK_DIR, exist_ok=True)

    names = catalog_names()
    results: dict[str, dict] = {}
    t0 = time.time()
    chunks = [
        names[i : i + args.chunk] for i in range(0, len(names), args.chunk)
    ]
    for ci, chunk in enumerate(chunks):
        out_path = os.path.join(CHUNK_DIR, f"chunk{ci}.json")
        if os.path.exists(out_path):  # resumable across restarts
            data = json.load(open(out_path))
            if set(chunk) <= set(data) - {"_meta"}:
                results.update(
                    {k: v for k, v in data.items() if k != "_meta"}
                )
                print(f"chunk {ci}: cached", flush=True)
                continue
            os.remove(out_path)
        done = run_chunk(chunk, out_path, args.timeout)
        got: dict[str, dict] = {}
        if done and os.path.exists(out_path):
            got = {
                k: v
                for k, v in json.load(open(out_path)).items()
                if k != "_meta"
            }
        missing = [n for n in chunk if n not in got]
        # chunk timed out mid-way: isolate the stuck query by re-running
        # the missing tail one at a time
        for n in missing:
            solo_path = os.path.join(CHUNK_DIR, f"solo_{n}.json")
            if run_chunk([n], solo_path, args.solo_timeout) and os.path.exists(
                solo_path
            ):
                got.update(
                    {
                        k: v
                        for k, v in json.load(open(solo_path)).items()
                        if k != "_meta"
                    }
                )
            else:
                got[n] = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": False,
                    "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"timeout(>{args.solo_timeout}s solo) at sf1.0",
                }
        if done and os.path.exists(out_path) and not missing:
            pass  # chunk artifact already complete
        else:  # persist the repaired chunk so a restart can resume
            with open(out_path, "w") as fh:
                json.dump(got, fh)
        results.update(got)
        npass = sum(
            1
            for v in results.values()
            if v.get("hash_match") or (v.get("rows_only") and v["rows_match"])
        )
        print(
            f"chunk {ci + 1}/{len(chunks)}: {npass}/{len(results)} pass "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )

    n_pass = sum(
        1
        for v in results.values()
        if v.get("hash_match") or (v.get("rows_only") and v["rows_match"])
    )
    from gee_datapipeline_spark.plans import oracle_sql

    out = {
        "_meta": {
            "sf_dir": SF1_DIR,
            "n_queries": len(results),
            "n_oracles": len(oracle_sql()),
            "n_pass": n_pass,
            "protocol": "rows+schema+value-hash (driver gate); "
            "rows_only where no oracle exists",
        }
    }
    out.update(dict(sorted(results.items())))
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"{n_pass}/{len(results)} pass -> {OUT}")


if __name__ == "__main__":
    main()
