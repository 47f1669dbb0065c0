"""Shared gate-protocol comparison for the differential fuzz harnesses.

Each harness builds its own random tables (that part is domain-specific)
and then runs the identical driver protocol per query: row count,
sorted-column schema, order-insensitive value hash — Spark vs DuckDB
over the same temp parquet directory.
"""

from __future__ import annotations

import tempfile

import duckdb

from parity_sweep import value_hash

from gee_datapipeline_spark.plans.registry import QUERIES


def run_battery(spark, frames: dict, names) -> None:
    """Write ``frames`` (table name → pandas DataFrame) as parquet into
    one temp dir, register DuckDB views, and assert the full gate
    protocol for every query in ``names``."""
    with tempfile.TemporaryDirectory() as d:
        con = duckdb.connect()
        for t, obj in frames.items():
            if callable(obj):  # custom writer (e.g. arrow list<float32>)
                obj(f"{d}/{t}.parquet")
            else:
                obj.to_parquet(f"{d}/{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
            )
        try:
            for name in names:
                q = QUERIES[name]
                spdf = q.spark(spark, d).toPandas()
                dpdf = con.execute(q.oracle).fetchdf()
                assert len(spdf) == len(dpdf), (
                    name, len(spdf), len(dpdf),
                )
                assert sorted(spdf.columns) == sorted(dpdf.columns), name
                assert value_hash(spdf) == value_hash(dpdf), (
                    name, spdf.head(10), dpdf.head(10),
                )
        finally:
            con.close()
