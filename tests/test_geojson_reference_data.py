"""S4 ingest against the reference's real OSM amenity exports (data
files, read-only): ragged property bags, way-polygon geometries, real
feature counts (SURVEY.md §0). Skipped when the reference tree is
absent."""

from __future__ import annotations

import os

import pytest

from gee_datapipeline_spark.sources.geojson import read_geojson

REF_DIR = "/root/reference/AminitiesGeoJSON"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference data not available"
)


def test_powerplants_ingest(spark):
    df = read_geojson(spark, os.path.join(REF_DIR, "PowerPlants.geojson"))
    rows = df.collect()
    assert len(rows) == 12  # SURVEY.md §0: 12 power plants
    assert all(r.source == "powerplants" for r in rows)
    # OSM way features carry coordinates + ragged tags
    named = [r for r in rows if r.props.get("name")]
    assert named, "expected at least one named plant"
    # representative points fall in/near North India
    assert all(70 < r.lon < 90 and 20 < r.lat < 35 for r in rows)


def test_amenity_props_are_ragged(spark):
    df = read_geojson(spark, os.path.join(REF_DIR, "PowerPlants.geojson"))
    keysets = [set(r.props.keys()) for r in df.collect()]
    assert len({frozenset(k) for k in keysets}) > 1, (
        "OSM property bags should differ per feature (MAP, not struct)"
    )
