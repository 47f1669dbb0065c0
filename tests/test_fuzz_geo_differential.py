"""Differential fuzz for the geo clip/dissolve family.

The catalog's geo oracles run against ONE fixed fixture whose shapes
were hand-placed to avoid boundaries; this harness generates random
polygons (including self-intersecting polylines, holes, multi-part
unions) and random query points, and compares the Arrow-batched NumPy
ray-cast against an EXACT rational-arithmetic reference
(``fractions.Fraction`` — zero rounding), so any float or
vectorization bug in the hot path surfaces as a hard mismatch.

Why this cannot flake: polygon vertices live on the 1/8 lattice and
query points on the odd-1/16 lattice, so (a) a point's y never equals
a vertex y (no crossing-convention ambiguity — any correct even-odd
formulation agrees), and (b) the horizontal gap between a point and an
edge crossing is either exactly zero or at least 1/1024 — twelve
orders of magnitude above double rounding error, and the exact-zero
case is itself dyadic, which IEEE arithmetic reproduces bit-exactly.
The same lattice argument makes ``rect_union_area``'s decimal(30,6)
routing exact: 1/8-lattice rectangles have areas in multiples of
1/64 = 0.015625, exactly six decimals.

Soak knob: SPARK_GRAFT_FUZZ_EXAMPLES, like the other harnesses.
"""

from __future__ import annotations

import os as _os
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gee_datapipeline_spark.functions.geo import (
    clip_to_polygon,
    clip_to_union,
    rect_union_area,
)

_FUZZ_EX = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))

# 1/8-lattice coordinate in [0, 4] as an exact float
_COORD = st.integers(0, 32).map(lambda k: k / 8.0)


def _ring_str(pts) -> str:
    return ", ".join(f"{x} {y}" for x, y in pts)


def _exact_even_odd(px: float, py: float, rings) -> bool:
    """Even-odd containment with zero rounding: Fraction throughout."""
    x, y = Fraction(px), Fraction(py)
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = Fraction(ring[i][0]), Fraction(ring[i][1])
            x2, y2 = (
                Fraction(ring[(i + 1) % n][0]),
                Fraction(ring[(i + 1) % n][1]),
            )
            if (y1 > y) != (y2 > y):
                xint = x1 + (x2 - x1) * (y - y1) / (y2 - y1)
                if x < xint:
                    inside = not inside
    return inside


@st.composite
def _rings_and_points(draw, min_rings=1, max_rings=3):
    """Random rings (arbitrary closed polylines — even-odd is well
    defined without simplicity) + query points off the vertex lattice."""
    rings = []
    for _ in range(draw(st.integers(min_rings, max_rings))):
        pts = draw(
            st.lists(st.tuples(_COORD, _COORD), min_size=3, max_size=8)
        )
        rings.append(pts)
    # points on the odd-1/16 lattice: never on a vertex row/column
    points = draw(
        st.lists(
            st.tuples(
                st.integers(0, 31).map(lambda k: k / 8.0 + 1 / 16.0),
                st.integers(0, 31).map(lambda k: k / 8.0 + 1 / 16.0),
            ),
            min_size=1,
            max_size=25,
            unique=True,
        )
    )
    return rings, points


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_rings_and_points())
def test_fuzz_clip_polygon_vs_exact_fraction(spark, data):
    """Multi-ring even-odd clip == exact rational even-odd."""
    rings, points = data
    poly = ";".join(_ring_str(r) for r in rings)
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)],
        ["pid", "lon", "lat"],
    )
    got = sorted(r.pid for r in clip_to_polygon(df, poly).collect())
    want = sorted(
        i
        for i, (x, y) in enumerate(points)
        if _exact_even_odd(x, y, rings)
    )
    assert got == want


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=st.lists(_rings_and_points(max_rings=2), min_size=2, max_size=4),
    points=st.lists(
        st.tuples(
            st.integers(0, 31).map(lambda k: k / 8.0 + 1 / 16.0),
            st.integers(0, 31).map(lambda k: k / 8.0 + 1 / 16.0),
        ),
        min_size=1,
        max_size=25,
        unique=True,
    ),
)
def test_fuzz_clip_union_vs_exact_fraction(spark, parts, points):
    """Dissolve containment (inside ANY member, each member even-odd
    with its own holes) == the exact rational OR — including members
    that overlap, where ring-flattening would disagree."""
    members = [rings for rings, _ in parts]
    polys = [";".join(_ring_str(r) for r in rings) for rings in members]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)],
        ["pid", "lon", "lat"],
    )
    got = sorted(r.pid for r in clip_to_union(df, polys).collect())
    want = sorted(
        i
        for i, (x, y) in enumerate(points)
        if any(_exact_even_odd(x, y, rings) for rings in members)
    )
    assert got == want


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 31),
                st.integers(0, 31),
                st.integers(1, 8),
                st.integers(1, 8),
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_fuzz_rect_union_area_vs_cell_count(spark, groups):
    """Grouped slab-sweep union area == exact 1/8-cell counting
    (rect edges sit on cell boundaries, so the count is exact; areas
    are multiples of 1/64, exactly representable through the
    decimal(30,6) sum and the double result)."""
    rows = []
    expected = {}
    for g, rects in enumerate(groups):
        key = f"g{g}"
        cells = set()
        for ix, iy, w, h in rects:
            rows.append(
                (key, ix / 8.0, iy / 8.0, (ix + w) / 8.0, (iy + h) / 8.0)
            )
            cells.update(
                (cx, cy)
                for cx in range(ix, ix + w)
                for cy in range(iy, iy + h)
            )
        expected[key] = (len(rects), len(cells) / 64.0)
    df = spark.createDataFrame(rows, ["g", "x1", "y1", "x2", "y2"])
    got = {
        r.g: (r.n_rects, r.union_area)
        for r in rect_union_area(df, group=["g"]).collect()
    }
    assert got == expected


# ---------------------------------------------- r9: line geometry
#
# The r8 line operators (line_vertices / line_segments /
# proximity_join_lines) had brute-force equality tests at fixed
# fixtures only; this battery hypothesis-randomizes the polylines —
# collinear runs, zero-length (duplicate-vertex) segments, duplicate
# segments, vertices exactly on grid-cell boundaries — and checks the
# bucketed join against an exact per-pair brute force that mirrors
# point_to_segment_km's operation order. The radius comparison is
# ulp-tolerant (JVM Math.cos vs C libm may differ in the last bit), so
# the assertions are two-sided set containment with a 1e-9 km guard
# band plus per-pair distance agreement to 1e-9 — twelve orders below
# the km scale of the distances, so a real candidate-drop or formula
# bug cannot hide inside the band.

import json as _json
import math as _math

from gee_datapipeline_spark.functions.geo import (
    KM_PER_DEG,
    line_segments,
    line_vertices,
    proximity_join_lines,
)

# 0.05-degree lattice over [0, 2]: multiples of the 0.1-degree
# latitude cell (radius 11.132 km) land EXACTLY on cell boundaries,
# exercising the halo logic every example.
_LCOORD = st.integers(0, 40).map(lambda k: k * 0.05)
_LINE_RADIUS_KM = 11.132
_EPS_KM = 1e-9


def _ref_seg_km(plon, plat, lon1, lat1, lon2, lat2) -> float:
    """Pure-Python mirror of point_to_segment_km, same op order."""
    ky = KM_PER_DEG
    kx = ky * _math.cos(_math.radians((lat1 + lat2) / 2.0))
    ax = (lon1 - plon) * kx
    ay = (lat1 - plat) * ky
    bx = (lon2 - plon) * kx
    by = (lat2 - plat) * ky
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    t = (
        0.0
        if len2 == 0.0
        else max(0.0, min(1.0, -(ax * dx + ay * dy) / len2))
    )
    cx = ax + t * dx
    cy = ay + t * dy
    return _math.sqrt(cx * cx + cy * cy)


@st.composite
def _polylines(draw, max_features=4, max_vertices=6):
    """Random polylines with adversarial shapes: duplicate vertices
    (zero-length segments), repeated whole segments (lists are NOT
    unique), and frequent collinear runs (the coarse lattice makes
    axis-aligned collinearity common)."""
    return [
        draw(
            st.lists(
                st.tuples(_LCOORD, _LCOORD), min_size=2,
                max_size=max_vertices,
            )
        )
        for _ in range(draw(st.integers(1, max_features)))
    ]


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_polylines(max_features=5, max_vertices=8))
def test_fuzz_line_segments_vs_reference(spark, lines):
    """GeoJSON-shaped features -> line_vertices -> line_segments
    reproduces exactly the consecutive-vertex pairs, including
    zero-length and duplicated segments (no dedup, no reorder)."""
    rows = [
        (
            "fuzz",
            f"f{i}",
            "LineString",
            {"__coordinates": _json.dumps(pts)},
        )
        for i, pts in enumerate(lines)
    ]
    feats = spark.createDataFrame(
        rows, "source string, feature_id string, geom_type string, "
        "props map<string,string>"
    )
    got = sorted(
        (r.feature_id, r.seq, r.lon1, r.lat1, r.lon2, r.lat2)
        for r in line_segments(line_vertices(feats)).collect()
    )
    want = sorted(
        (f"f{i}", s, a[0], a[1], b[0], b[1])
        for i, pts in enumerate(lines)
        for s, (a, b) in enumerate(zip(pts, pts[1:]))
    )
    assert got == want


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=_polylines(),
    points=st.lists(
        st.tuples(_LCOORD, _LCOORD), min_size=1, max_size=20,
        unique=True,
    ),
)
def test_fuzz_proximity_join_lines_vs_bruteforce(spark, lines, points):
    """Bucketed point-to-line join == exact brute force over all
    (pixel, feature) pairs: candidate-complete (no pair within
    radius - eps missing), no false positives (every emitted pair is
    within radius + eps), and min-over-segments distances agree to
    1e-9 km."""
    seg_rows = [
        (f"f{i}", a[0], a[1], b[0], b[1])
        for i, pts in enumerate(lines)
        for a, b in zip(pts, pts[1:])
    ]
    segs = spark.createDataFrame(
        seg_rows,
        "feature_id string, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    px = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)],
        "pid int, lon double, lat double",
    )
    got = {
        (r.pid, r.pt_feature_id): r.distance_km
        for r in proximity_join_lines(
            px, segs, _LINE_RADIUS_KM
        ).collect()
    }
    brute = {}
    for i, (x, y) in enumerate(points):
        for j, pts in enumerate(lines):
            d = min(
                _ref_seg_km(x, y, a[0], a[1], b[0], b[1])
                for a, b in zip(pts, pts[1:])
            )
            brute[(i, f"f{j}")] = d
    must_have = {
        k for k, d in brute.items() if d <= _LINE_RADIUS_KM - _EPS_KM
    }
    missing = must_have - set(got)
    assert not missing, f"candidate pairs dropped: {missing}"
    for k, d in got.items():
        assert brute[k] <= _LINE_RADIUS_KM + _EPS_KM, (k, d, brute[k])
        assert abs(d - brute[k]) <= _EPS_KM, (k, d, brute[k])


# ------------------------------------------- r10: antimeridian seam
#
# The r9 batteries pin the line operators in a LOCAL window; the seam
# itself was covered only by fixed fixtures. This battery draws random
# polylines whose longitudes live on a 0.05-degree lattice WRAPPED
# around ±180 (offsets on both sides, duplicate vertices, coordinates
# exactly ON the seam and on cell boundaries), so seam-CROSSING
# segments arise in roughly half the draws — exercising the RFC 7946
# §3.1.9 cut (split_segments_at_antimeridian) against an exact
# per-pair reference that mirrors the cut and the wrapped planar
# distance operation-for-operation.

from gee_datapipeline_spark.functions.geo import (  # noqa: E402
    proximity_join_lines as _pjl,
    split_segments_at_antimeridian as _split_spark,
)

# k in [-40, 40] -> unwrapped 178..182 -> wrapped [178, 180] u (-180, -178]
_SEAM_LON = st.integers(-40, 40).map(
    lambda k: (180.0 + k * 0.05) - 360.0
    if (180.0 + k * 0.05) > 180.0
    else (180.0 + k * 0.05)
)


def _py_split(lon1, lat1, lon2, lat2):
    """Pure-Python mirror of split_segments_at_antimeridian."""
    if abs(lon1 - lon2) > 180.0:
        if lon1 > 0.0:
            seam1, lon2n = 180.0, lon2 + 360.0
        else:
            seam1, lon2n = -180.0, lon2 - 360.0
        denom = lon2n - lon1
        t = (seam1 - lon1) / denom if denom != 0.0 else 1.0
        lat_cut = lat1 + t * (lat2 - lat1)
        return [(lon1, lat1, seam1, lat_cut), (-seam1, lat_cut, lon2, lat2)]
    return [(lon1, lat1, lon2, lat2)]


def _wrap_d(d):
    if abs(d) > 180.0:
        return d - 360.0 if d > 0.0 else d + 360.0
    return d


def _ref_seg_km_wrap(plon, plat, lon1, lat1, lon2, lat2) -> float:
    """Wrap-aware mirror of point_to_segment_km, same op order."""
    ky = KM_PER_DEG
    kx = ky * _math.cos(_math.radians((lat1 + lat2) / 2.0))
    ax = _wrap_d(lon1 - plon) * kx
    ay = (lat1 - plat) * ky
    bx = _wrap_d(lon2 - plon) * kx
    by = (lat2 - plat) * ky
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    t = (
        0.0
        if len2 == 0.0
        else max(0.0, min(1.0, -(ax * dx + ay * dy) / len2))
    )
    cx = ax + t * dx
    cy = ay + t * dy
    return _math.sqrt(cx * cx + cy * cy)


@st.composite
def _seam_polylines(draw, max_features=4, max_vertices=6):
    """Random polylines straddling ±180: duplicate vertices, repeated
    segments, on-seam coordinates, ~half the consecutive pairs
    crossing (any opposite-sign pair in this domain spans > 180°)."""
    return [
        draw(
            st.lists(
                st.tuples(_SEAM_LON, _LCOORD), min_size=2,
                max_size=max_vertices,
            )
        )
        for _ in range(draw(st.integers(1, max_features)))
    ]


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_seam_polylines(max_features=5, max_vertices=6))
def test_fuzz_antimeridian_split_vs_mirror(spark, lines):
    """split_segments_at_antimeridian == the Python mirror, bit for
    bit, on seam-straddling polylines (incl. on-seam vertices and
    duplicate vertices), and the split is idempotent."""
    seg_rows = [
        (f"f{i}", s, a[0], a[1], b[0], b[1])
        for i, pts in enumerate(lines)
        for s, (a, b) in enumerate(zip(pts, pts[1:]))
    ]
    segs = spark.createDataFrame(
        seg_rows,
        "feature_id string, seq int, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    got = sorted(
        tuple(r) for r in _split_spark(segs).collect()
    )
    want = sorted(
        (fid, s, *h)
        for fid, s, lon1, lat1, lon2, lat2 in seg_rows
        for h in _py_split(lon1, lat1, lon2, lat2)
    )
    assert got == want
    again = sorted(
        tuple(r) for r in _split_spark(_split_spark(segs)).collect()
    )
    assert again == want


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=_seam_polylines(),
    points=st.lists(
        st.tuples(_SEAM_LON, _LCOORD), min_size=1, max_size=20,
        unique=True,
    ),
)
def test_fuzz_proximity_join_lines_seam_vs_bruteforce(spark, points, lines):
    """Bucketed point-to-line join across the seam == exact brute
    force (Python split + wrapped per-half distance, min over halves):
    candidate-complete, no false positives, distances to 1e-9 km —
    the same contract the local-window battery pins, now with the
    cut and the pmod cell wrap in every example."""
    seg_rows = [
        (f"f{i}", a[0], a[1], b[0], b[1])
        for i, pts in enumerate(lines)
        for a, b in zip(pts, pts[1:])
    ]
    segs = spark.createDataFrame(
        seg_rows,
        "feature_id string, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    px = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)],
        "pid int, lon double, lat double",
    )
    got = {
        (r.pid, r.pt_feature_id): r.distance_km
        for r in _pjl(px, segs, _LINE_RADIUS_KM).collect()
    }
    brute = {}
    for i, (x, y) in enumerate(points):
        for j, pts in enumerate(lines):
            d = min(
                _ref_seg_km_wrap(x, y, *h)
                for a, b in zip(pts, pts[1:])
                for h in _py_split(a[0], a[1], b[0], b[1])
            )
            brute[(i, f"f{j}")] = d
    must_have = {
        k for k, d in brute.items() if d <= _LINE_RADIUS_KM - _EPS_KM
    }
    missing = must_have - set(got)
    assert not missing, f"candidate pairs dropped: {missing}"
    for k, d in got.items():
        assert brute[k] <= _LINE_RADIUS_KM + _EPS_KM, (k, d, brute[k])
        assert abs(d - brute[k]) <= _EPS_KM, (k, d, brute[k])
