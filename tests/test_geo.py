"""Golden tests for the geo operators DuckDB can't express
(FIXTURES.md §A5): bbox/polygon filters, haversine proximity join,
normalize guards, NaN/NULL composite semantics, classification buckets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.geo import (
    bbox_contains,
    clip_to_polygon,
    grid_cell,
    haversine_km,
    proximity_join,
)
from gee_datapipeline_spark.operators.classify import (
    classify_with_thresholds,
)
from gee_datapipeline_spark.operators.composites import mean_composite
from gee_datapipeline_spark.operators.windows import minmax_normalize
from gee_datapipeline_spark.sources.synthetic import (
    DELHI_BBOX,
    make_amenities,
    make_pixels,
    make_regions,
    make_thresholds,
)


@pytest.fixture(scope="module")
def pixels(spark):
    return make_pixels(spark, months=2, grid=8).cache()


def test_bbox_filter(spark, pixels):
    """P5 — all synthetic pixels lie inside the Delhi bbox; a shifted
    bbox excludes everything."""
    inside = pixels.filter(
        bbox_contains(F.col("lon"), F.col("lat"), *DELHI_BBOX)
    ).count()
    assert inside == pixels.count()
    outside = pixels.filter(
        bbox_contains(F.col("lon"), F.col("lat"), 80.0, 30.0, 81.0, 31.0)
    ).count()
    assert outside == 0


def test_haversine_known_distance(spark):
    """1 degree of latitude ≈ 111.2 km; same point → 0."""
    df = spark.createDataFrame(
        [(77.0, 28.0, 77.0, 29.0), (77.0, 28.0, 77.0, 28.0)],
        ["lon1", "lat1", "lon2", "lat2"],
    )
    d = df.select(
        haversine_km(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("d")
    ).collect()
    assert abs(d[0].d - 111.19) < 0.5
    assert d[1].d == 0.0


def test_point_in_polygon_diamond(spark):
    """Exact ray-cast containment on the diamond region: center in,
    bbox corner (outside the diamond but inside its bbox) out."""
    regions = make_regions(spark)
    poly = regions.filter(F.col("region") == "delhi_diamond").collect()[0][
        "polygon"
    ]
    pts = spark.createDataFrame(
        [
            (1, 77.25, 28.6),   # center — inside
            (2, 76.96, 28.31),  # bbox corner area — outside the diamond
            (3, 77.25, 28.89),  # near top vertex — inside
            (4, 70.0, 20.0),    # far away
        ],
        ["id", "lon", "lat"],
    )
    got = {r.id for r in clip_to_polygon(pts, poly).collect()}
    assert got == {1, 3}


def test_clip_holed_multipolygon_string(spark):
    """Even-odd over multiple rings: a holed rectangle + a disjoint
    part, as a ';'-separated ring string (the delhi_holed_multi
    fixture shape)."""
    regions = make_regions(spark)
    poly = regions.filter(
        F.col("region") == "delhi_holed_multi"
    ).collect()[0]["polygon"]
    pts = spark.createDataFrame(
        [
            (1, 77.02, 28.32),  # part A, outside the hole — inside
            (2, 77.10, 28.45),  # inside the hole — outside
            (3, 77.40, 28.70),  # part B — inside
            (4, 77.28, 28.65),  # between the parts — outside
            (5, 77.16, 28.45),  # part A, just east of the hole — inside
            (6, 70.00, 20.00),  # far away
        ],
        ["id", "lon", "lat"],
    )
    got = {r.id for r in clip_to_polygon(pts, poly).collect()}
    assert got == {1, 3, 5}


def test_clip_geojson_multipolygon(spark):
    """GeoJSON MultiPolygon geometry (dict and JSON-string forms) —
    the literal shape class of FAO GAUL ADM1 boundaries; same even-odd
    semantics as the ring-string form."""
    import json

    geom = {
        "type": "MultiPolygon",
        "coordinates": [
            [  # part A: unit square with a center hole
                [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                 [0.0, 0.0]],
                [[1.5, 1.5], [2.5, 1.5], [2.5, 2.5], [1.5, 2.5],
                 [1.5, 1.5]],
            ],
            [  # part B: disjoint square
                [[10.0, 10.0], [12.0, 10.0], [12.0, 12.0],
                 [10.0, 12.0], [10.0, 10.0]],
            ],
        ],
    }
    pts = spark.createDataFrame(
        [
            (1, 0.5, 0.5),    # part A — inside
            (2, 2.0, 2.0),    # hole — outside
            (3, 11.0, 11.0),  # part B — inside
            (4, 6.0, 6.0),    # between — outside
        ],
        ["id", "lon", "lat"],
    )
    for spec in (geom, json.dumps(geom)):
        got = {r.id for r in clip_to_polygon(pts, spec).collect()}
        assert got == {1, 3}, type(spec)


def test_clip_geojson_polygon_with_hole(spark):
    """GeoJSON Polygon with an interior ring behaves as a hole."""
    geom = {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
        ],
    }
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 1.5, 1.5), (3, 2.5, 2.5)],
        ["id", "lon", "lat"],
    )
    got = {r.id for r in clip_to_polygon(pts, geom).collect()}
    assert got == {1, 3}


def test_proximity_join_matches_bruteforce(spark, pixels):
    """J2 — grid-bucketed proximity join returns exactly the brute-force
    haversine pairs (the bucketing must not lose border candidates)."""
    amen = make_amenities(spark, n=10)
    px = pixels.filter(
        (F.col("dataset") == "no2") & (F.col("date") == F.lit("2025-01-02"))
    ).select("x", "y", "lon", "lat")
    radius = 10.0

    fast = proximity_join(px, amen.select("feature_id", "lon", "lat"), radius)
    fast_pairs = {
        (r.x, r.y, r.pt_feature_id) for r in fast.collect()
    }

    brute = (
        px.crossJoin(
            amen.select(
                F.col("feature_id").alias("fid"),
                F.col("lon").alias("alon"),
                F.col("lat").alias("alat"),
            )
        )
        .withColumn(
            "d",
            haversine_km(
                F.col("lon"), F.col("lat"), F.col("alon"), F.col("alat")
            ),
        )
        .filter(F.col("d") <= radius)
    )
    brute_pairs = {(r.x, r.y, r.fid) for r in brute.collect()}
    assert fast_pairs == brute_pairs
    assert len(brute_pairs) > 0


def test_grid_cell_stability(spark):
    """Same coordinates → same cell; cells differ across the boundary."""
    df = spark.createDataFrame(
        [(77.0, 28.0), (77.0, 28.0), (77.0 + 0.2, 28.0)], ["lon", "lat"]
    )
    cells = [r.c for r in df.select(grid_cell(F.col("lon"), F.col("lat"), 0.1).alias("c")).collect()]
    assert cells[0] == cells[1]
    assert cells[0] != cells[2]


def test_composite_null_semantics(spark, pixels):
    """A1 + watch-list #1: avg skips NULLs; all-NULL groups yield NULL
    mean with n_obs=0 (the empty-collection case)."""
    comp = mean_composite(
        pixels.filter(F.col("dataset") == "no2"),
        ["x", "y", F.date_format(F.date_trunc("month", "date"), "yyyy-MM")],
    )
    # make_pixels forces pixel (0,0) in month 1 to be all-NULL
    row = comp.filter(
        (F.col("x") == 0) & (F.col("y") == 0)
    ).orderBy("date_format(date_trunc(month, date), yyyy-MM)").collect()
    assert row[0].mean_value is None
    assert row[0].n_obs == 0
    # non-degenerate groups have values
    assert comp.filter(F.col("mean_value").isNotNull()).count() > 0


def test_normalize_guard_constant_raster(spark):
    """W1 — the +1e-6 guard: a constant raster normalizes to 0, not
    NaN/error (DataDownloader_V1.py:62)."""
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 5.0)], ["img", "value"]
    )
    out = minmax_normalize(df, ["img"]).collect()
    assert all(r.norm_value == 0.0 for r in out)


def test_normalize_zero_preserving(spark):
    """W1 FRP variant — zeros stay exactly 0 (transparent), positives
    scale within the positive range (SNPP:78-82)."""
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 20.0)], ["img", "value"]
    )
    out = {
        r.value: r.norm_value
        for r in minmax_normalize(df, ["img"], zero_preserving=True).collect()
    }
    # Reference semantics: global min/max (zeros included), positives
    # scaled, zeros pinned to 0 → 10/20 = 0.5, 20/20 = 1.0.
    assert out[0.0] == 0.0
    assert out[20.0] == 1.0
    assert out[10.0] == 0.5


def test_classification_buckets(spark, pixels):
    """F3 — thresholds join + CASE buckets reproduce V3's rules."""
    th = make_thresholds(spark)
    classed = classify_with_thresholds(
        pixels.filter(F.col("value").isNotNull()), th, on="dataset"
    )
    rows = classed.select("dataset", "value", "std_value", "bucket").collect()
    for r in rows:
        if r.value < r.std_value:
            assert r.bucket == "below_standard"
        elif r.value < 1.5 * r.std_value:
            assert r.bucket == "elevated"
        elif r.value < 2 * r.std_value:
            assert r.bucket == "high"
        else:
            assert r.bucket == "severe"


def test_proximity_join_lon_shrink_regression(spark):
    """J2 — longitude degrees shrink by cos(lat): at Delhi's latitude a
    10 km radius spans ~0.102° lon, more than the 0.0898° lat-derived
    cell. A pair straddling two cell boundaries in x must still be found
    (regression: sizing both axes from the lat bound dropped it)."""
    # lon1 sits just left of an old-cell boundary, lon2 0.1 deg right —
    # TWO lat-sized cells apart (verified against the old sizing), but
    # only ~9.76 km at lat 28.6.
    px = spark.createDataFrame(
        [(77.004827164929, 28.6, 1.0)], ["lon", "lat", "value"]
    )
    pt = spark.createDataFrame(
        [("a1", 77.104827164929, 28.6)], ["feature_id", "lon", "lat"]
    )
    got = proximity_join(px, pt, radius_km=10.0).collect()
    assert len(got) == 1
    assert got[0].pt_feature_id == "a1"
    assert got[0].distance_km < 10.0


def test_proximity_join_distance_round(spark):
    """distance_round quantizes before the radius test (oracle parity)."""
    px = spark.createDataFrame([(77.0, 28.6, 1.0)], ["lon", "lat", "value"])
    pt = spark.createDataFrame([("a1", 77.05, 28.6)], ["feature_id", "lon", "lat"])
    got = proximity_join(px, pt, radius_km=10.0, distance_round=6).collect()
    assert len(got) == 1
    assert got[0].distance_km == round(got[0].distance_km, 6)


# --------------------------------------------------- exact dissolve (A6)


def test_clip_to_union_vs_flattened_even_odd(spark):
    """Dissolve semantics: a point in BOTH overlapping districts is
    inside the union, but flattening all rings into one even-odd test
    toggles it off. clip_to_union must keep it."""
    from gee_datapipeline_spark.functions.geo import clip_to_union

    regions = make_regions(spark)
    polys = {
        r["region"]: r["polygon"]
        for r in regions.filter(
            F.col("region").isin("dist_west", "dist_east")
        ).collect()
    }
    pts = spark.createDataFrame(
        [
            (1, 77.29, 28.48),   # in the overlap of both districts
            (2, 77.10, 28.40),   # west only
            (3, 77.40, 28.70),   # east only
            (4, 76.90, 28.30),   # neither
        ],
        ["pid", "lon", "lat"],
    )
    got = sorted(
        r.pid
        for r in clip_to_union(pts, list(polys.values())).collect()
    )
    assert got == [1, 2, 3]
    # flattened even-odd (the multi-ring clip) drops the overlap point
    flat = ";".join(polys.values())
    flat_ids = sorted(r.pid for r in clip_to_polygon(pts, flat).collect())
    assert flat_ids == [2, 3]


def test_rect_union_area_golden(spark):
    """Hand-checked dissolve areas: overlap, nesting, disjoint,
    touching — and the grouped form keeps groups independent."""
    from gee_datapipeline_spark.functions.geo import rect_union_area

    rows = [
        # g1: two 2x2 squares overlapping on a 1x1 corner -> 7
        ("g1", 0.0, 0.0, 2.0, 2.0),
        ("g1", 1.0, 1.0, 3.0, 3.0),
        # g2: nested -> outer area 16
        ("g2", 0.0, 0.0, 4.0, 4.0),
        ("g2", 1.0, 1.0, 2.0, 2.0),
        # g3: disjoint 1x1 + 2x1 -> 3
        ("g3", 0.0, 0.0, 1.0, 1.0),
        ("g3", 5.0, 5.0, 7.0, 6.0),
        # g4: touching edge-to-edge -> 2
        ("g4", 0.0, 0.0, 1.0, 1.0),
        ("g4", 1.0, 0.0, 2.0, 1.0),
    ]
    df = spark.createDataFrame(rows, ["g", "x1", "y1", "x2", "y2"])
    got = {
        r.g: (r.n_rects, r.sum_rect_area, r.union_area)
        for r in rect_union_area(df, group=["g"]).collect()
    }
    assert got == {
        "g1": (2, 8.0, 7.0),
        "g2": (2, 17.0, 16.0),
        "g3": (2, 3.0, 3.0),
        "g4": (2, 2.0, 2.0),
    }
    # ungrouped: one global row over g1's pair
    one = rect_union_area(
        df.filter(F.col("g") == "g1").drop("g")
    ).collect()
    assert [(r.n_rects, r.union_area) for r in one] == [(2, 7.0)]


def test_rect_union_area_matches_cell_count(spark):
    """Independent oracle: integer-coordinate rectangles -> union area
    equals the count of covered unit cells (brute force)."""
    import random

    from gee_datapipeline_spark.functions.geo import rect_union_area

    rng = random.Random(42)
    rects = []
    for _ in range(25):
        x1, y1 = rng.randint(0, 12), rng.randint(0, 12)
        rects.append(
            (
                float(x1),
                float(y1),
                float(x1 + rng.randint(1, 5)),
                float(y1 + rng.randint(1, 5)),
            )
        )
    covered = {
        (i, j)
        for x1, y1, x2, y2 in rects
        for i in range(int(x1), int(x2))
        for j in range(int(y1), int(y2))
    }
    df = spark.createDataFrame(rects, ["x1", "y1", "x2", "y2"])
    row = rect_union_area(df).collect()[0]
    assert row.n_rects == 25
    assert row.union_area == float(len(covered))


# ---------------------------------------------------------------------------
# J2-line: point-to-segment proximity over road LineStrings


@pytest.fixture(scope="module")
def road_segments(spark):
    from gee_datapipeline_spark.functions.geo import (
        line_segments,
        line_vertices,
    )
    from gee_datapipeline_spark.sources.fixtures import (
        FIXTURES_DIR,
        ensure_geo_fixtures,
    )
    from gee_datapipeline_spark.sources.geojson import read_geojson

    ensure_geo_fixtures()
    roads = read_geojson(
        spark, str(FIXTURES_DIR / "roads.geojson"), source="roads"
    )
    return line_segments(line_vertices(roads)).cache()


def test_line_vertices_roundtrip(spark, road_segments):
    """Vertex explode recovers every coordinate of every LineString
    bit-exactly (repr floats survive the JSON round trip)."""
    from gee_datapipeline_spark.sources.fixtures import ROAD_PARAMS
    from gee_datapipeline_spark.sources.synthetic import roads_rows

    want_segs = sum(len(v) - 1 for _, _, v in roads_rows(**ROAD_PARAMS))
    rows = road_segments.collect()
    assert len(rows) == want_segs
    by_road = {}
    for r in rows:
        by_road.setdefault(r.feature_id, []).append(r)
    for fid, cls, verts in roads_rows(**ROAD_PARAMS):
        got = sorted(by_road[fid], key=lambda r: r.seq)
        assert [(g.lon1, g.lat1) for g in got] == verts[:-1]
        assert (got[-1].lon2, got[-1].lat2) == verts[-1]


def test_point_to_segment_distance_geometry(spark):
    """Closed-form checks of the planar distance: endpoint hit,
    perpendicular foot inside the segment, clamped beyond an end."""
    from gee_datapipeline_spark.functions.geo import (
        KM_PER_DEG,
        point_to_segment_km,
    )

    # Segment along the equator from (0,0) to (1,0): ky=kx (cos 0 = 1).
    df = spark.createDataFrame(
        [
            (0.0, 0.0),    # on the start vertex -> 0
            (0.5, 0.5),    # foot at (0.5, 0) -> 0.5 deg of lat
            (2.0, 0.0),    # beyond the end -> clamp to (1,0), 1 deg
        ],
        ["plon", "plat"],
    )
    d = df.select(
        point_to_segment_km(
            F.col("plon"), F.col("plat"),
            F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0),
        ).alias("d")
    ).collect()
    assert d[0].d == pytest.approx(0.0, abs=1e-12)
    assert d[1].d == pytest.approx(0.5 * KM_PER_DEG, rel=1e-12)
    assert d[2].d == pytest.approx(1.0 * KM_PER_DEG, rel=1e-12)


def test_proximity_join_lines_matches_bruteforce(spark, pixels, road_segments):
    """J2-line — the covering-cell-range bucketing returns exactly the
    brute-force pairs AND the identical min distance per pair."""
    from gee_datapipeline_spark.functions.geo import (
        point_to_segment_km,
        proximity_join_lines,
    )

    px = pixels.filter(
        (F.col("dataset") == "no2") & F.col("value").isNotNull()
    ).select("x", "y", "lon", "lat").distinct()
    radius = 5.0

    fast = proximity_join_lines(px, road_segments, radius)
    fast_pairs = {
        (r.x, r.y, r.pt_feature_id): r.distance_km for r in fast.collect()
    }

    seg = road_segments.select(
        F.col("feature_id").alias("fid"),
        F.col("lon1").alias("slon1"), F.col("lat1").alias("slat1"),
        F.col("lon2").alias("slon2"), F.col("lat2").alias("slat2"),
    )
    brute = (
        px.crossJoin(seg)
        .withColumn(
            "d",
            point_to_segment_km(
                F.col("lon"), F.col("lat"),
                F.col("slon1"), F.col("slat1"),
                F.col("slon2"), F.col("slat2"),
            ),
        )
        .groupBy("x", "y", "fid")
        .agg(F.min("d").alias("d"))
        .filter(F.col("d") <= radius)
    )
    brute_pairs = {(r.x, r.y, r.fid): r.d for r in brute.collect()}
    assert fast_pairs.keys() == brute_pairs.keys()
    assert len(fast_pairs) > 0
    for k, d in brute_pairs.items():
        assert fast_pairs[k] == d, k


def test_parse_rings_drops_z_coordinate(spark):
    """GAUL-style [lon, lat, z] positions must clip identically to
    their 2-D twins (the z column is sliced off before ray casting)."""
    geom2d = {
        "type": "Polygon",
        "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
    }
    geom3d = {
        "type": "Polygon",
        "coordinates": [
            [[0, 0, 7.5], [4, 0, 7.5], [4, 4, 7.5], [0, 4, 7.5], [0, 0, 7.5]]
        ],
    }
    pts = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 5.0, 5.0), (3, 0.5, 3.5)],
        ["id", "lon", "lat"],
    )
    got2d = {r.id for r in clip_to_polygon(pts, geom2d).collect()}
    got3d = {r.id for r in clip_to_polygon(pts, geom3d).collect()}
    assert got2d == got3d == {1, 3}


# ---------------------------------------------------- r9: antimeridian


def test_proximity_join_across_antimeridian(spark):
    """A fire at lon 179.99 and a station at -179.99 (same lat) are
    ~2.2 km apart on the sphere; the wrapped grid must pair them. The
    pair set equals brute-force haversine over ALL pixel-point combos,
    including pixels at lon exactly +180 (legal GeoJSON, aliases
    -180)."""
    px = spark.createDataFrame(
        [
            (1, 179.99, 10.0),   # just west of the seam
            (2, -179.99, 10.0),  # just east of the seam
            (3, 180.0, 10.2),    # ON the seam, east alias
            (4, 178.5, 10.0),    # ~165 km west of the seam: no match
            (5, 179.99, 35.0),   # wrong latitude: no match
        ],
        "pid int, lon double, lat double",
    )
    pts = spark.createDataFrame(
        [("sA", -179.995, 10.001), ("sB", 179.999, 10.195)],
        "feature_id string, lon double, lat double",
    )
    radius = 10.0
    got = {
        (r.pid, r.pt_feature_id)
        for r in proximity_join(px, pts, radius).collect()
    }
    brute = {
        (r.pid, r.fid)
        for r in px.crossJoin(
            pts.select(
                F.col("feature_id").alias("fid"),
                F.col("lon").alias("alon"),
                F.col("lat").alias("alat"),
            )
        )
        .withColumn(
            "d",
            haversine_km(
                F.col("lon"), F.col("lat"), F.col("alon"), F.col("alat")
            ),
        )
        .filter(F.col("d") <= radius)
        .collect()
    }
    assert got == brute
    # the seam-straddling pairs specifically must be present: pixel 1
    # (lon 179.99) to sA (lon -179.995) crosses the seam, as does
    # pixel 3 (lon exactly +180) to sB (lon 179.999)
    assert (1, "sA") in got and (2, "sA") in got and (3, "sB") in got


def test_proximity_join_lines_across_antimeridian(spark):
    """A road hugging the seam on the west side (lon 179.95..179.99)
    must match pixels on the EAST side (lon -179.99) at their true
    ~1-2 km distance — both the cell bucketing (pmod wrap) and the
    planar distance (wrap_dlon) cross the seam. Equality against a
    brute force that evaluates the same wrapped formula on all
    pairs."""
    from gee_datapipeline_spark.functions.geo import (
        point_to_segment_km,
        proximity_join_lines,
    )

    segs = spark.createDataFrame(
        [
            ("road_w", 179.95, 9.98, 179.99, 10.02),
            ("road_far", 177.0, 10.0, 177.2, 10.0),
        ],
        "feature_id string, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    px = spark.createDataFrame(
        [
            (1, -179.99, 10.0),
            (2, -179.95, 10.01),
            (3, 179.97, 10.0),
            (4, -178.0, 10.0),  # ~200 km east: no match
        ],
        "pid int, lon double, lat double",
    )
    radius = 10.0
    fast = {
        (r.pid, r.pt_feature_id): r.distance_km
        for r in proximity_join_lines(px, segs, radius).collect()
    }
    brute_rows = (
        px.crossJoin(
            segs.select(
                F.col("feature_id").alias("fid"),
                F.col("lon1").alias("slon1"), F.col("lat1").alias("slat1"),
                F.col("lon2").alias("slon2"), F.col("lat2").alias("slat2"),
            )
        )
        .withColumn(
            "d",
            point_to_segment_km(
                F.col("lon"), F.col("lat"),
                F.col("slon1"), F.col("slat1"),
                F.col("slon2"), F.col("slat2"),
            ),
        )
        .groupBy("pid", "fid")
        .agg(F.min("d").alias("d"))
        .filter(F.col("d") <= radius)
        .collect()
    )
    brute = {(r.pid, r.fid): r.d for r in brute_rows}
    assert fast == brute
    assert (1, "road_w") in fast and (3, "road_w") in fast
    assert fast[(1, "road_w")] < 5.0  # true seam-crossing distance


def _py_split_seam(lon1, lat1, lon2, lat2):
    """Pure-Python mirror of split_segments_at_antimeridian — same
    branch structure, same operation order, same IEEE doubles."""
    if abs(lon1 - lon2) > 180.0:
        if lon1 > 0.0:
            seam1, lon2n = 180.0, lon2 + 360.0
        else:
            seam1, lon2n = -180.0, lon2 - 360.0
        denom = lon2n - lon1
        t = (seam1 - lon1) / denom if denom != 0.0 else 1.0
        lat_cut = lat1 + t * (lat2 - lat1)
        return [
            (lon1, lat1, seam1, lat_cut),
            (-seam1, lat_cut, lon2, lat2),
        ]
    return [(lon1, lat1, lon2, lat2)]


def test_split_segments_at_antimeridian(spark):
    """r10 (replacing the r9 loud reject): the RFC 7946 §3.1.9 cut.
    Crossing segments split into two halves meeting at ±180 at the
    chord-interpolated latitude; non-crossing rows pass through
    BIT-EXACT; the on-seam degenerate (180 → −180, zero denominator)
    keeps the full segment on the lon1 side. Equality against the
    pure-Python mirror, bit for bit."""
    from gee_datapipeline_spark.functions.geo import (
        split_segments_at_antimeridian,
    )

    rows = [
        ("cross_e", 179.5, 0.0, -179.5, 1.0),
        ("cross_w", -179.8, 0.0, 179.8, -0.4),
        ("near", 179.0, 0.5, 179.9, 0.6),
        ("on_seam", 180.0, -0.5, -180.0, 0.5),
        ("exact_180_span", 90.0, 2.0, -90.0, 3.0),  # ambiguous: no cut
    ]
    segs = spark.createDataFrame(
        rows,
        "feature_id string, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    got = sorted(
        tuple(r)
        for r in split_segments_at_antimeridian(segs).collect()
    )
    want = sorted(
        (fid, *h)
        for fid, lon1, lat1, lon2, lat2 in rows
        for h in _py_split_seam(lon1, lat1, lon2, lat2)
    )
    assert got == want
    # idempotent: a second application is the identity
    again = sorted(
        tuple(r)
        for r in split_segments_at_antimeridian(
            split_segments_at_antimeridian(segs)
        ).collect()
    )
    assert again == want


def test_proximity_join_lines_cuts_crossing_segment(spark):
    """A segment whose endpoints span >180 deg of raw longitude crosses
    the antimeridian; r10 CUTS it at ±180 (RFC 7946 §3.1.9) instead of
    rejecting, so pixels on BOTH sides of the seam match at their true
    near-image distance — equality against a brute force that splits
    with the Python mirror and measures each half with the wrapped
    planar formula."""
    import math

    from gee_datapipeline_spark.functions.geo import (
        KM_PER_DEG,
        proximity_join_lines,
    )

    def wrap(d):
        if abs(d) > 180.0:
            return d - 360.0 if d > 0.0 else d + 360.0
        return d

    def ref_seg(plon, plat, lon1, lat1, lon2, lat2):
        ky = KM_PER_DEG
        kx = ky * math.cos(math.radians((lat1 + lat2) / 2.0))
        ax = wrap(lon1 - plon) * kx
        ay = (lat1 - plat) * ky
        bx = wrap(lon2 - plon) * kx
        by = (lat2 - plat) * ky
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = (
            0.0
            if len2 == 0.0
            else max(0.0, min(1.0, -(ax * dx + ay * dy) / len2))
        )
        cx, cy = ax + t * dx, ay + t * dy
        return math.sqrt(cx * cx + cy * cy)

    seg_rows = [
        ("crossing", 179.9, 10.0, -179.9, 10.1),
        ("west_only", 179.5, 9.9, 179.7, 10.0),
        ("far", 177.0, 10.0, 177.2, 10.0),
    ]
    segs = spark.createDataFrame(
        seg_rows,
        "feature_id string, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    px_rows = [
        (1, 179.99, 10.0),    # west of the seam, on the crossing chord
        (2, -179.95, 10.05),  # east of the seam
        (3, 180.0, 10.02),    # exactly ON the seam (east alias)
        (4, -178.0, 10.0),    # ~200 km east: no match
    ]
    px = spark.createDataFrame(
        px_rows, "pid int, lon double, lat double"
    )
    radius = 10.0
    got = {
        (r.pid, r.pt_feature_id): r.distance_km
        for r in proximity_join_lines(px, segs, radius).collect()
    }
    brute = {}
    for pid, x, y in px_rows:
        for fid, lon1, lat1, lon2, lat2 in seg_rows:
            d = min(
                ref_seg(x, y, *h)
                for h in _py_split_seam(lon1, lat1, lon2, lat2)
            )
            brute[(pid, fid)] = min(brute.get((pid, fid), d), d)
    want = {k: d for k, d in brute.items() if d <= radius}
    assert set(got) == set(want)
    for k, d in got.items():
        assert abs(d - want[k]) <= 1e-9, (k, d, want[k])
    # the crossing road must be matched from BOTH sides of the seam
    assert (1, "crossing") in got and (2, "crossing") in got
    assert (3, "crossing") in got
    assert got[(1, "crossing")] < 5.0
