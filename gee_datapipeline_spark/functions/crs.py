"""Coordinate reference system transforms (SURVEY.md §2.8 F8).

The reference reprojects raster coordinates to EPSG:4326 with
``rasterio.warp.transform`` and falls back to identity on failure
(fix_transparency.py:71-74). pyproj/rasterio are not in this container,
so the two projections the reference's data actually lives in are
implemented directly from their public formulas:

- EPSG:4326 (lon/lat degrees, WGS84) — the canonical model CRS.
- EPSG:3857 (Web Mercator meters) — what the folium/leaflet viewers
  render in (index.html map tiles).

Both directions are vectorized NumPy inside an Arrow-batched pandas UDF;
unknown CRS pairs raise (or identity-fallback, mirroring the reference)
rather than silently guessing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

WGS84_RADIUS_M = 6378137.0  # spherical Web Mercator Earth radius


def _lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray):
    x = np.radians(lon) * WGS84_RADIUS_M
    lat_c = np.clip(lat, -85.051128779806604, 85.051128779806604)
    y = WGS84_RADIUS_M * np.log(np.tan(np.pi / 4 + np.radians(lat_c) / 2))
    return x, y


def _webmercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / WGS84_RADIUS_M)
    lat = np.degrees(2 * np.arctan(np.exp(y / WGS84_RADIUS_M)) - np.pi / 2)
    return lon, lat

_XY_SCHEMA = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)


def make_crs_transform_udf(src: str, dst: str, strict: bool = False):
    """Vectorized (x, y) -> struct(x, y) transform between supported CRS.

    ``strict=False`` reproduces the reference's identity fallback for
    unsupported pairs (fix_transparency.py:73-74: "use original
    coordinates")."""
    src_n, dst_n = src.upper(), dst.upper()

    def pick():
        if src_n == dst_n:
            return lambda x, y: (x, y)
        if (src_n, dst_n) == ("EPSG:4326", "EPSG:3857"):
            return _lonlat_to_webmercator
        if (src_n, dst_n) == ("EPSG:3857", "EPSG:4326"):
            return _webmercator_to_lonlat
        if strict:
            raise ValueError(f"unsupported CRS pair {src} -> {dst}")
        return lambda x, y: (x, y)  # reference fallback behavior

    fn = pick()

    @F.pandas_udf(_XY_SCHEMA)
    def crs_udf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        ox, oy = fn(x.to_numpy(np.float64), y.to_numpy(np.float64))
        return pd.DataFrame({"x": ox, "y": oy})

    return crs_udf
