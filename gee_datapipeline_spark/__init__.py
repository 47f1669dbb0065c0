"""gee_datapipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (Zekamuu/GEE_DataPipeline): lazy
collection algebra (filterDate / filterBounds / select / mean / max / clip)
as DataFrame/Catalyst plans, client-side raster math as column expressions
and windows, the monthly driver loops as date-bucketed group-bys, and the
near-real-time fire feed as Structured Streaming — plus the LLM-data-pipeline
operator set (dedup, similarity search, text analysis, multimodal plumbing)
required to run the same engine at 100 TB scale.

Package map
-----------
- ``session``    SparkSession factory tuned for the target workload
- ``catalog``    table loading / view registration for the driver's test data
- ``model``      canonical schemas (pixels, features, regions, thresholds)
- ``operators``  composites, windows, joins, calendar, classification, set ops
- ``functions``  geo, text, dedup, similarity, multimodal column helpers
- ``sources``    GeoJSON ingest, synthetic raster generation, raster ingest stubs
- ``sinks``      partitioned parquet / CSV point sinks, viz stubs
- ``streaming``  windowed composite + session-window incident streaming jobs
- ``plans``      the registered query catalog (queries + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
