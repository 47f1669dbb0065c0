"""Table catalog over the driver-provided parquet test data.

``TESTDATA.md``: each scale-factor directory holds one parquet file per
table. Loading is centralized here so every query sees the same source
relation (one place to attach bucketing / sorting / caching decisions later).

At 100 TB these would be partitioned/bucketed catalog tables; the loader
keeps the indirection so the physical layout can change without touching
any operator code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Filters/projections compose on top and are
    pushed into the parquet scan by Catalyst.

    ``events`` is stored with nanosecond timestamps, which Spark's parquet
    reader rejects (PARQUET_TYPE_ILLEGAL). We read nanos as raw INT64 via
    the legacy conf and rebuild the timestamp at microsecond precision —
    truncating, exactly as DuckDB does when it narrows ns → µs."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
