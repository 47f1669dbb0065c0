"""Geo-domain queries on the synthetic pixel fixtures (FIXTURES.md §A).

These register the reference's actual geospatial surface — the V1
pipeline chain, polygon clip, amenity proximity, resample — as
``queries()`` entries. They run on the deterministic synthetic rasters
(``sources.synthetic``, seeded), not the sf tables, so they are
rows-only in the oracle gate; their semantics are golden-tested in
``tests/test_geo.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import bbox_contains, clip_to_polygon, proximity_join
from ..operators.classify import classify_with_thresholds
from ..operators.composites import grid_resample, mean_composite, max_composite
from ..operators.windows import minmax_normalize
from ..sources.synthetic import (
    DELHI_BBOX,
    make_amenities,
    make_pixels,
    make_regions,
    make_thresholds,
)
from .registry import Query, register


def _pixels(spark: SparkSession) -> DataFrame:
    return make_pixels(spark, months=2, grid=10)


def _geo_flagship_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference V1 pipeline end-to-end (DataDownloader_V1.py:94-153):
    dataset/band select (P1) → date-range filter (P4) → bbox filter (P5)
    → per-pixel monthly mean (A1) → per-image min-max normalize (W1)."""
    px = _pixels(spark)
    month = F.date_format(F.date_trunc("month", "date"), "yyyy-MM")
    filtered = px.filter(
        (F.col("dataset") == "no2")
        & (F.col("date") >= F.lit("2025-01-01"))
        & (F.col("date") < F.lit("2025-03-01"))
        & bbox_contains(F.col("lon"), F.col("lat"), *DELHI_BBOX)
    )
    comp = mean_composite(
        filtered.withColumn("month", month), ["x", "y", "lon", "lat", "month"]
    )
    return minmax_normalize(comp, ["month"], value="mean_value")


register(
    Query(
        name="geo_flagship_v1",
        spark=_geo_flagship_v1,
        oracle=None,
        tags=("geo", "A1", "W1", "P4", "P5"),
    )
)


def _geo_clip_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — exact polygon clip (``clip(geom)`` / ``rasterio.mask``,
    DataDownloader_V1.py:145,54): bbox prefilter + ray-cast UDF, then a
    per-dataset count of surviving pixels."""
    px = _pixels(spark)
    regions = make_regions(spark)
    poly = regions.filter(F.col("region") == "delhi_diamond").first()["polygon"]
    return (
        clip_to_polygon(px, poly)
        .groupBy("dataset")
        .agg(F.count(F.lit(1)).alias("n_pixels_in_region"))
    )


register(
    Query(
        name="geo_clip_polygon",
        spark=_geo_clip_polygon,
        oracle=None,
        tags=("geo", "J1", "P6"),
    )
)


def _geo_proximity_amenities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — the advocacy query the reference answers visually
    (README.md:2; power-plant overlay DataDownloader_V2.py:96-102):
    max observed value within 10 km of each amenity."""
    px = _pixels(spark).filter(F.col("value").isNotNull())
    amen = make_amenities(spark, n=15)
    near = proximity_join(
        px.select("dataset", "lon", "lat", "value"),
        amen.select("feature_id", "lon", "lat"),
        radius_km=10.0,
    )
    return near.groupBy("pt_feature_id", "dataset").agg(
        F.max("value").alias("max_value_10km"),
        F.count(F.lit(1)).alias("n_pixels"),
    )


register(
    Query(
        name="geo_proximity_amenities",
        spark=_geo_proximity_amenities,
        oracle=None,
        tags=("geo", "J2"),
    )
)


def _geo_resample_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 + F3 — regrid to 2x2-coarser cells (scale=1000 analog,
    DataDownloader_V1.py:149) then classify cell means against the WHO
    thresholds (DataDownloader_V3.py:62-73)."""
    px = _pixels(spark)
    th = make_thresholds(spark)
    cells = grid_resample(
        px.select("dataset", "x", "y", "value"),
        {
            "dataset": F.col("dataset"),
            "cx": F.floor(F.col("x") / 2),
            "cy": F.floor(F.col("y") / 2),
        },
    )
    classed = classify_with_thresholds(
        cells, th, on="dataset", value="cell_value"
    )
    return classed.groupBy("dataset", "bucket").agg(
        F.count(F.lit(1)).alias("n_cells")
    )


register(
    Query(
        name="geo_resample_classify",
        spark=_geo_resample_classify,
        oracle=None,
        tags=("geo", "A7", "F3"),
    )
)


def _geo_feature_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 + F6 + S2 — FeatureCollection attribute filter: the chained
    property-equality predicates (``ee.Filter.eq('ADM1_NAME','Punjab')``,
    DataDownloader_SNPP_VIIRS_V1.py:33) against the MAP property bag."""
    amen = make_amenities(spark, n=20)
    return (
        amen.filter(
            (F.col("props")["plant:source"] == "coal")
            & (F.col("geom_type") == "Point")
        )
        .select(
            "feature_id",
            F.col("props")["name"].alias("plant_name"),  # P9 tooltip proj
            "lon",
            "lat",
        )
    )


register(
    Query(
        name="geo_feature_filter",
        spark=_geo_feature_filter,
        oracle=None,
        tags=("geo", "P2", "P9", "F6", "S2"),
    )
)


def _geo_region_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — geometry union as bbox envelope: dissolve each feature
    source to its bounding box (``punjab.geometry()``,
    DataDownloader_SNPP_VIIRS_V1.py:36)."""
    amen = make_amenities(spark, n=20)
    return amen.groupBy("source").agg(
        F.round(F.min("lon"), 6).alias("min_lon"),
        F.round(F.min("lat"), 6).alias("min_lat"),
        F.round(F.max("lon"), 6).alias("max_lon"),
        F.round(F.max("lat"), 6).alias("max_lat"),
        F.count(F.lit(1)).alias("n_features"),
    )


register(
    Query(
        name="geo_region_envelope",
        spark=_geo_region_envelope,
        oracle=None,
        tags=("geo", "A6", "aggregation"),
    )
)


def _geo_max_composite_frp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — the VIIRS max-FRP composite with zero-preserving normalize
    (DataDownloader_SNPP_VIIRS_V1.py:155,74-82)."""
    px = make_pixels(spark, months=1, grid=10, datasets=("co",))
    comp = max_composite(
        px.withColumn("value", F.coalesce("value", F.lit(0.0))),
        ["x", "y"],
    )
    return minmax_normalize(
        comp.withColumn("img", F.lit("frp")), ["img"],
        value="max_value", zero_preserving=True,
    )


register(
    Query(
        name="geo_max_composite_frp",
        spark=_geo_max_composite_frp,
        oracle=None,
        tags=("geo", "A2", "W1"),
    )
)
