#!/usr/bin/env python
"""Dump ``explain("formatted")`` for catalog queries to plans/<tag>/.

Usage:
    python tools/explain_dump.py <outdir-suffix> [query ...]

Writes ``plans/r10/<query>_<suffix>.txt`` for each named query (default:
the bench HEADLINE list). The explain runs against $SPARK_GRAFT_SF_DIR
(default sf0.1) with the same session the bench uses, so plan shapes
(join strategy, Exchange count, PushedFilters) match what the bench
times. Queries that drive a streaming job or write a sink as a side
effect are explained on their *returned* DataFrame — for those the file
records the final-assembly plan, and the inner streaming plan is noted
by the query's docstring instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from gee_datapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Round tag for the output directory (plans/<tag>/): r10 dumps are
# committed history; current-round dumps default to r11.
OUT_DIR = os.path.join(
    os.environ.get(
        "SPARK_GRAFT_PLANS_ROOT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
        ),
    ),
    os.environ.get("SPARK_GRAFT_PLANS_TAG", "r11"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    spark = get_spark("explain-dump")
    from gee_datapipeline_spark.plans import queries

    qs = queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — dump what we can
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
