"""End-to-end facade tests: the reference user's workflow
(generate → render → export → monthly run) on the engine."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.pipeline import (
    export_composite,
    generate_composite,
    render_composite,
    run_monthly,
)
from gee_datapipeline_spark.sources.synthetic import (
    DELHI_BBOX,
    make_pixels,
    make_thresholds,
)


@pytest.fixture(scope="module")
def pixels(spark):
    return make_pixels(spark, months=3, grid=8).cache()


def test_generate_composite_monthly_mean(spark, pixels):
    comp = generate_composite(
        pixels, ["no2"], "2025-01-01", "2025-04-01", bbox=DELHI_BBOX
    )
    rows = comp.collect()
    assert {r.bucket for r in rows} == {
        "2025-01-01", "2025-02-01", "2025-03-01",
    }
    # 8x8 grid per month
    assert len(rows) == 3 * 64
    # composite mean matches a direct computation for one pixel
    sample = [r for r in rows if r.x == 3 and r.y == 3][0]
    direct = (
        pixels.filter(
            (F.col("dataset") == "no2")
            & (F.col("x") == 3) & (F.col("y") == 3)
            & (F.date_format(F.date_trunc("month", "date"), "yyyy-MM-dd")
               == sample.bucket)
        )
        .agg(F.round(F.avg("value"), 4))
        .collect()[0][0]
    )
    assert sample.value_agg == pytest.approx(direct, abs=1e-3)


def test_generate_composite_resample(spark, pixels):
    comp = generate_composite(
        pixels, ["no2"], "2025-01-01", "2025-02-01", resample_cells=2
    )
    xs = {r.x for r in comp.collect()}
    assert xs == {0, 1, 2, 3}  # 8-wide grid → 4 cells


def test_render_composite_channels(spark, pixels):
    comp = generate_composite(pixels, ["no2"], "2025-01-01", "2025-02-01")
    rendered = render_composite(comp, thresholds=make_thresholds(spark))
    row = rendered.filter(F.col("norm_value").isNotNull()).first()
    assert 0 <= row.norm_value <= 1
    assert row["bucket"] == "2025-01-01"  # time bucket preserved
    assert row["class_bucket"] in (
        "below_standard", "elevated", "high", "severe",
    )
    assert row["std_value"] > 0  # thresholds joined
    assert 0 <= row.r <= 255 and row.a in (0, 255)


def test_run_monthly_partition_tree(spark, pixels, tmp_path):
    """The reference's per-month output tree falls out of partitionBy."""
    counts = run_monthly(
        pixels, ["no2", "co"], "2025-01-01", "2025-03-01", str(tmp_path)
    )
    assert set(counts) == {"2025-01-01", "2025-02-01"}
    assert all(n == 2 * 64 for n in counts.values())
    parts = glob.glob(
        os.path.join(str(tmp_path), "parquet", "dataset=*", "date=*")
    )
    assert len(parts) == 4  # 2 datasets x 2 months
    csvs = glob.glob(os.path.join(str(tmp_path), "csv", "*.csv"))
    assert csvs
    back = spark.read.parquet(os.path.join(str(tmp_path), "parquet"))
    assert back.count() == 4 * 64
