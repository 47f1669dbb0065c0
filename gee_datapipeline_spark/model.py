"""Canonical schemas (SURVEY.md §1, §7).

The long pixel table is the reference's own CSV flattening
(``lat,lon,mean`` — fix_transparency.py:76-83) promoted to the primary
representation: one row per (dataset, band, date, pixel). At 100 TB it is
Parquet partitioned by ``(dataset, date)`` so temporal/dataset predicates
prune partitions before any scan, and sorted within files by ``(y, x)``
for spatial locality.

NULL (not NaN) is nodata (watch-list #1): Spark aggregates skip NULLs,
matching the reference's ``nanmin/nanmax/np.nanmean`` semantics; NaN would
instead poison ``avg``. Ingest converts NaN → NULL (``nan_to_null``).
"""

from __future__ import annotations

from pyspark.sql import types as T

PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),  # e.g. 'no2', 'viirs_frp'
        T.StructField("band", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("ts", T.TimestampType(), True),  # event time (streaming)
        T.StructField("x", T.IntegerType(), False),  # grid col index
        T.StructField("y", T.IntegerType(), False),  # grid row index
        T.StructField("lon", T.DoubleType(), False),  # EPSG:4326 pixel center
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), True),  # NULL = nodata
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),  # 'powerplants', ...
        T.StructField("feature_id", T.StringType(), False),
        T.StructField("geom_type", T.StringType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        # Ragged OSM tags: MAP, not a wide struct (100+ sparse keys).
        T.StructField(
            "props", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

REGIONS_SCHEMA = T.StructType(
    [
        T.StructField("region", T.StringType(), False),
        T.StructField("min_lon", T.DoubleType(), False),
        T.StructField("min_lat", T.DoubleType(), False),
        T.StructField("max_lon", T.DoubleType(), False),
        T.StructField("max_lat", T.DoubleType(), False),
        # Closed ring "lon lat, lon lat, ..." for exact point-in-polygon.
        T.StructField("polygon", T.StringType(), True),
    ]
)

THRESHOLDS_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("std_value", T.DoubleType(), False),
    ]
)

# Multimodal: media as opaque binary + typed metadata (BASELINE.json north
# star). The payload column stays opaque to the engine; decode runs in
# Arrow-batched pandas UDFs (functions.multimodal).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField(
            "meta", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)
