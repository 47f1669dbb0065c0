"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (the reference's V1 semantics:
per-pixel temporal mean composite + per-image min-max normalization,
SURVEY.md §7) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
operator catalog from ``gee_datapipeline_spark.plans`` for the DuckDB
differential gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gee_datapipeline_spark.catalog import load_table
from gee_datapipeline_spark.operators import composites, windows

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference V1 pipeline re-expressed
    (DataDownloader_V1.py:94-153) — filter → per-(pixel,dataset,day) mean
    composite (A1) → per-(dataset,day) min-max normalize (W1)."""
    events = load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "date", F.to_date("ts")
    )
    composite = composites.mean_composite(
        events, ["user_id", "event_type", "date"]
    )
    return windows.minmax_normalize(
        composite, ["event_type", "date"], value="mean_value"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gee_datapipeline_spark.plans import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    from gee_datapipeline_spark.plans import oracle_sql as _oracle_sql

    return _oracle_sql()
