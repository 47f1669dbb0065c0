"""Text-format sources: CSV points and newline-delimited JSON.

The reference round-trips its rasters through CSV (``lat,lon,mean`` at
6 dp — fix_transparency.py:76-83) and carries JSON property bags; a
complete engine ingests both. Schemas are EXPLICIT — schema inference
is a full extra pass over the data at 100 TB and can silently flip
types between runs, so these readers never infer.

Both are splittable text sources: Spark assigns file splits per
executor, filters/projections push into the scan, and a malformed line
lands in ``_corrupt_record`` (PERMISSIVE) instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

POINTS_CSV_SCHEMA = "lat double, lon double, mean double"
LOGS_JSONL_SCHEMA = (
    "dataset string, date date, x int, y int, value double"
)


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """S8's inverse: the engine's own CSV export shape back to rows."""
    return (
        spark.read.schema(POINTS_CSV_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited JSON event/pixel log with an explicit schema
    (each line parses independently — the splittable JSON form)."""
    return spark.read.schema(LOGS_JSONL_SCHEMA).json(path)
