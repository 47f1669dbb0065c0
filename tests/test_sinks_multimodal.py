"""Tests for sinks (partitioned parquet, CSV points, RGBA data-side PNG)
and the multimodal mapInPandas plumbing."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.multimodal import (
    image_features,
    sample_frames,
)
from gee_datapipeline_spark.model import MEDIA_SCHEMA
from gee_datapipeline_spark.sinks.writers import (
    MAX_IMAGE_PIXELS,
    render_png,
    rgba_rows,
    write_pixels,
    write_points_csv,
)
from gee_datapipeline_spark.sources.synthetic import make_pixels


@pytest.fixture(scope="module")
def pixels(spark):
    return make_pixels(spark, months=1, grid=6).cache()


def test_write_pixels_partitioned(spark, pixels, tmp_path_factory):
    """S6 — (dataset, date) partition tree + partition-pruned re-read."""
    out = str(tmp_path_factory.mktemp("store") / "pixels")
    write_pixels(pixels, out)
    dirs = glob.glob(os.path.join(out, "dataset=*/date=*"))
    assert len(dirs) >= 2
    back = spark.read.parquet(out)
    assert back.count() == pixels.count()
    pruned = back.filter(F.col("dataset") == "no2")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "dataset=no2" in plan or "PartitionFilters" in plan  # pruned scan
    assert pruned.count() == pixels.filter(F.col("dataset") == "no2").count()


def test_write_points_csv(spark, pixels, tmp_path_factory):
    """S8 — lat,lon,mean with 6-dp rounding (fix_transparency.py:82)."""
    out = str(tmp_path_factory.mktemp("csv") / "points")
    write_points_csv(pixels.filter(F.col("value").isNotNull()), out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    header = open(files[0]).readline().strip()
    assert header == "lat,lon,mean"


def test_rgba_rows_invariants(spark):
    """S7 data side — the transparency invariant of
    check_png_properties.py:7-8: alpha=0 exactly where value is 0/null;
    channels are uint8-range ints."""
    df = spark.createDataFrame(
        [(0.0,), (0.25,), (0.5,), (0.75,), (1.0,), (None,)],
        "norm_value double",
    )
    rows = rgba_rows(df).collect()
    for r in rows:
        if r.norm_value is None or r.norm_value <= 0:
            assert r.a == 0
        else:
            assert r.a == 255
        for c in (r.r, r.g, r.b):
            assert 0 <= c <= 255
    mid = [r for r in rows if r.norm_value == 0.5][0]
    assert mid.g == 255  # jet: green peaks at the middle


def test_render_png_guard(spark):
    """Watch-list #5 — image-shaped sinks refuse unbounded images."""
    big = spark.range(MAX_IMAGE_PIXELS + 1).select(
        F.lit(0.5).alias("norm_value")
    )
    with pytest.raises(ValueError, match="refusing to render"):
        render_png(rgba_rows(big), "/tmp/never.png")


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", bytes([1, 2, 3, 4]), None, None, None, {}),
        (2, "image", "image/png", bytes([9, 9, 9]), None, None, None, {}),
        (3, "image", "image/png", None, None, None, None, {}),
        (4, "video", "video/mp4", bytes([7, 7]), None, None, 3500, {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media):
    a = {r.media_id: r for r in image_features(media).collect()}
    b = {r.media_id: r for r in image_features(media).collect()}
    assert a[1].sha256 == b[1].sha256
    assert a[1].mean_luma == b[1].mean_luma
    assert a[1].width == 8 and a[1].height == 8
    assert a[3].decode_ok is False and a[3].n_bytes == 0
    assert a[1].sha256 != a[2].sha256


def test_sample_frames_udtf_shape(spark, media):
    """One input video → multiple frame rows at the sample interval."""
    frames = sample_frames(media, every_ms=1000).collect()
    vid = [r for r in frames if r.media_id == 4]
    assert len(vid) == 4  # 0,1000,2000,3000 ms of a 3500 ms video
    assert [r.frame_ts_ms for r in sorted(vid, key=lambda r: r.frame_idx)] == [
        0, 1000, 2000, 3000,
    ]
    # images produce no frames
    assert all(r.media_id == 4 for r in frames)


def test_write_geotiffs_roundtrip(spark, tmp_path_factory):
    """S6 full form: pixel table → one GeoTIFF per (dataset, date) on
    the executors → re-ingest via read_rasters → bit-exact values,
    center-convention lon/lat, NaN nodata restored as NULL."""
    import numpy as np

    from gee_datapipeline_spark.sinks.writers import write_geotiffs
    from gee_datapipeline_spark.sources.raster import read_rasters

    cell = 0.25
    arrays = {
        ("no2", "2025-01-15"): np.array(
            [[1.5, np.nan, 3.0], [4.25, 5.0, -2.125]]
        ),
        ("co", "2025-02-15"): np.array(
            [[0.0, 7.75, 1.0], [np.nan, 2.5, 9.0]]
        ),
    }
    rows = []
    for (ds, date), vals in arrays.items():
        h, w = vals.shape
        for y in range(h):
            for x in range(w):
                v = vals[y, x]
                rows.append(
                    (ds, date, x, y,
                     70.0 + (x + 0.5) * cell, 20.0 + (y + 0.5) * cell,
                     None if np.isnan(v) else float(v))
                )
    df = spark.createDataFrame(
        rows,
        "dataset string, date string, x int, y int, "
        "lon double, lat double, value double",
    )
    out = str(tmp_path_factory.mktemp("tifs"))
    manifest = {
        (r.dataset, r.date): r
        for r in write_geotiffs(df, out, cell).collect()
    }
    assert len(manifest) == 2
    for (ds, date), vals in arrays.items():
        m = manifest[(ds, date)]
        assert m.width == 3 and m.height == 2 and m.n_bytes > 0
        assert os.path.basename(m.path) == f"{ds}_{date}.tif"
    back = read_rasters(spark, os.path.join(out, "*.tif")).toPandas()
    assert len(back) == 12
    for (ds, date), vals in arrays.items():
        sub = back[back["path"].str.contains(f"{ds}_{date}")]
        assert len(sub) == 6
        for _, r in sub.iterrows():
            want = vals[int(r.y), int(r.x)]
            if np.isnan(want):
                assert r.value is None or np.isnan(r.value)
            else:
                assert r.value == want  # bit-exact float64
            assert r.lon == 70.0 + (int(r.x) + 0.5) * cell
            assert r.lat == 20.0 + (int(r.y) + 0.5) * cell


def test_video_scene_cuts_on_handbuilt_video(spark):
    """Shot-boundary semantics on a video with KNOWN cuts: fills
    [10, 10, 200, 200, 50] have |deltas| [0, 190, 0, 150] against
    threshold 100 -> exactly 2 cuts, max jump 190."""
    import numpy as np

    from gee_datapipeline_spark.functions.multimodal import sample_frames
    from gee_datapipeline_spark.functions.videocodec import encode_y4m
    from gee_datapipeline_spark.sources.fixtures import SCENE_CUT_THRESH
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    fills = [10, 10, 200, 200, 50]
    frames_np = np.stack(
        [np.full((4, 6), v, dtype=np.uint8) for v in fills]
    )
    payload = encode_y4m(frames_np, fps=(25, 1), colorspace="mono")
    media = spark.createDataFrame(
        [(1, "video", "video/x-yuv4mpeg", bytearray(payload),
          None, None, None, {})],
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms int, meta map<string,string>",
    )
    fr = sample_frames(media, every_ms=40, fake=False)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    row = (
        fr.withColumn(
            "jump", F.abs(F.col("mean_y") - F.lag("mean_y").over(w))
        )
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(
                F.when(
                    F.col("jump") > F.lit(SCENE_CUT_THRESH), 1
                ).otherwise(0)
            ).alias("n_cuts"),
            F.max("jump").alias("max_jump"),
        )
        .collect()[0]
    )
    assert row.n_frames == 5
    assert row.n_cuts == 2
    assert row.max_jump == 190.0
