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
