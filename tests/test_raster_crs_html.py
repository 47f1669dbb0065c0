"""Tests: raster ingest UDTF plumbing (S3), CRS transforms (F8), and the
HTML presentation sinks (S9/S10)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.crs import make_crs_transform_udf
from gee_datapipeline_spark.sinks.html import render_layer_map, render_wrapper
from gee_datapipeline_spark.sources.raster import (
    encode_fake_raster,
    fake_raster_decoder,
    read_rasters,
)


@pytest.fixture(scope="module")
def raster_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rasters")
    vals1 = np.array([[1.0, 2.0], [3.0, np.nan]])
    vals2 = np.array([[10.0, 20.0], [30.0, 40.0]])
    (d / "no2_2025-01-01.tif").write_bytes(
        encode_fake_raster(vals1, 77.0, 28.0, 0.01)
    )
    (d / "no2_2025-02-01.tif").write_bytes(
        encode_fake_raster(vals2, 77.0, 28.0, 0.01)
    )
    return str(d)


def test_read_rasters_unpivots(spark, raster_dir):
    """S3 — two files → 8 pixel rows; NaN became NULL; pixel centers
    offset by half a cell (fix_transparency.py:68)."""
    px = read_rasters(spark, raster_dir + "/*.tif", decode=fake_raster_decoder)
    rows = px.collect()
    assert len(rows) == 8
    jan = [r for r in rows if "2025-01-01" in r.path]
    assert len(jan) == 4
    nulls = [r for r in jan if r.value is None]
    assert len(nulls) == 1 and nulls[0].x == 1 and nulls[0].y == 1
    first = next(r for r in jan if r.x == 0 and r.y == 0)
    assert first.lon == pytest.approx(77.005) and first.lat == pytest.approx(28.005)


def test_read_rasters_glob_pruning(spark, raster_dir):
    """S5 — filename-glob partition discovery."""
    only_jan = read_rasters(
        spark, raster_dir + "/no2_2025-01*.tif", decode=fake_raster_decoder
    )
    assert only_jan.count() == 4


def test_crs_roundtrip_webmercator(spark):
    """F8 — 4326 → 3857 → 4326 roundtrip; known anchor: lon 180° maps to
    ~20037508.34 m."""
    df = spark.createDataFrame(
        [(180.0, 0.0), (77.2, 28.6), (0.0, 0.0)], ["lon", "lat"]
    )
    fwd = make_crs_transform_udf("EPSG:4326", "EPSG:3857")
    back = make_crs_transform_udf("EPSG:3857", "EPSG:4326")
    out = (
        df.withColumn("m", fwd(F.col("lon"), F.col("lat")))
        .withColumn("r", back(F.col("m.x"), F.col("m.y")))
        .collect()
    )
    anchor = next(r for r in out if r.lon == 180.0)
    assert anchor.m.x == pytest.approx(20037508.342789244)
    for r in out:
        assert r.r.x == pytest.approx(r.lon, abs=1e-9)
        assert r.r.y == pytest.approx(r.lat, abs=1e-9)


def test_crs_identity_fallback(spark):
    """F8 — unsupported pair falls back to identity (the reference's
    try/except, fix_transparency.py:71-74); strict mode raises."""
    df = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    ident = make_crs_transform_udf("EPSG:32643", "EPSG:4326")
    r = df.select(ident(F.col("x"), F.col("y")).alias("o")).collect()[0].o
    assert (r.x, r.y) == (1.0, 2.0)
    with pytest.raises(ValueError, match="unsupported CRS pair"):
        make_crs_transform_udf("EPSG:32643", "EPSG:4326", strict=True)


def test_render_layer_map_selection():
    """S9 — overlays + P8 layer selection (unselected layers hidden)."""
    html = render_layer_map(
        "2025-01-01",
        {
            "no2": {"bounds": (76.85, 28.2, 77.65, 29.0), "image": "no2.png"},
            "co": {"bounds": (76.85, 28.2, 77.65, 29.0), "image": "co.png"},
        },
        selected=["no2"],
    )
    assert 'id="layer-no2"' in html and "display:block" in html
    assert 'id="layer-co"' in html and "display:none" in html
    assert "76.85" in html  # envelope bounds present


def test_render_wrapper_slider_defaults_latest():
    """S10 + W2 — slider spans the date spine, defaulting to latest."""
    html = render_wrapper(
        "wrapper", ["2025-02", "2025-01", "2025-03"], "maps/{date}/index.html"
    )
    assert 'max="2"' in html and 'value="2"' in html
    assert "2025-03" in html.split("date-label")[1][:40]
    assert "maps/2025-01/index.html" in html
    with pytest.raises(ValueError):
        render_wrapper("empty", [], "x/{date}")
