"""GeoJSON ingest (S4): FeatureCollection → features rows with MAP props."""

from __future__ import annotations

import json

import pytest

from gee_datapipeline_spark.sources.geojson import read_geojson


@pytest.fixture(scope="module")
def geojson_file(tmp_path_factory):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "way/1",
                "properties": {"name": "Plant A", "plant:source": "coal"},
                "geometry": {"type": "Point", "coordinates": [77.1, 28.6]},
            },
            {
                "type": "Feature",
                "id": "way/2",
                "properties": {"highway": "primary", "maxspeed": "80"},
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[77.0, 28.0], [77.2, 28.1]],
                },
            },
            {
                "type": "Feature",
                "id": "way/3",
                "properties": {"landuse": "industrial"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[76.9, 28.4], [77.0, 28.4], [77.0, 28.5], [76.9, 28.4]]
                    ],
                },
            },
        ],
    }
    p = tmp_path_factory.mktemp("geo") / "powerplants.geojson"
    p.write_text(json.dumps(fc))
    return str(p)


def test_read_geojson_flattens(spark, geojson_file):
    rows = {r.feature_id: r for r in read_geojson(spark, geojson_file).collect()}
    assert set(rows) == {"way/1", "way/2", "way/3"}

    pt = rows["way/1"]
    assert pt.geom_type == "Point"
    assert pt.lon == 77.1 and pt.lat == 28.6
    assert pt.props["name"] == "Plant A"
    assert pt.props["plant:source"] == "coal"  # ragged OSM key survives
    assert pt.source == "powerplants"

    line = rows["way/2"]
    assert line.geom_type == "LineString"
    assert (line.lon, line.lat) == (77.0, 28.0)  # first vertex
    assert line.props["maxspeed"] == "80"

    poly = rows["way/3"]
    assert (poly.lon, poly.lat) == (76.9, 28.4)
    # exact geometry retained for downstream consumers
    coords = json.loads(poly.props["__coordinates"])
    assert coords[0][0] == [76.9, 28.4]
