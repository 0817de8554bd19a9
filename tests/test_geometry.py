"""Geometry kernel tests, mirroring the reference's geometry unit tests
(/root/reference/src/osmgeom.rs:139-221): boundary inclusivity, holes,
degenerate point/line cases, plus a brute-force scalar oracle."""

import numpy as np
import pytest

from osm_replication_rust_spark.functions.geometry import (
    MultiPolygon,
    Ring,
    bbox_intersects_polygon,
    distance_to_boundary,
    points_in_buffered_polygon,
    points_in_polygon,
)

M = 1_000_000


def rect(x0, y0, x1, y1, hole=False):
    return Ring(
        coords=np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.int64
        ),
        hole=hole,
    )


@pytest.fixture
def square():
    return MultiPolygon("sq", [rect(0, 0, 10 * M, 10 * M)])


@pytest.fixture
def holed():
    return MultiPolygon("holed", [rect(0, 0, 10 * M, 10 * M), rect(3 * M, 3 * M, 6 * M, 6 * M, hole=True)])


def pip(mp, lon, lat):
    return bool(points_in_polygon(np.array([lon]), np.array([lat]), mp)[0])


def test_inside_outside(square):
    assert pip(square, 5 * M, 5 * M)
    assert not pip(square, 11 * M, 5 * M)
    assert not pip(square, -1, 5 * M)


def test_boundary_counts_inside(square):
    # geo::Intersects semantics: edges and vertices are inside
    assert pip(square, 0, 0)  # vertex
    assert pip(square, 0, 5 * M)  # vertical edge
    assert pip(square, 5 * M, 10 * M)  # horizontal edge
    assert pip(square, 10 * M, 10 * M)  # far vertex


def test_hole_subtracts(holed):
    assert pip(holed, 1 * M, 1 * M)
    assert not pip(holed, 4 * M, 4 * M)  # inside hole
    # hole boundary belongs to the polygon (Intersects semantics)
    assert pip(holed, 3 * M, 3 * M)
    # just inside hole edge
    assert not pip(holed, 3 * M + 1, 4 * M)


def test_non_rectilinear():
    tri = MultiPolygon(
        "tri",
        [Ring(np.array([[0, 0], [10 * M, 0], [5 * M, 10 * M], [0, 0]], dtype=np.int64))],
    )
    assert pip(tri, 5 * M, 1 * M)
    assert not pip(tri, 1 * M, 9 * M)
    assert pip(tri, 5 * M, 10 * M)  # apex
    # point exactly on the slanted edge: (2.5M, 5M) lies on (0,0)-(5M,10M)
    assert pip(tri, 25 * M // 10, 5 * M)


def test_brute_force_oracle(holed):
    """Compare the vectorized kernel against a scalar ray-cast written
    independently (even-odd, boundary handled by colinearity)."""
    rng = np.random.default_rng(7)
    lon = rng.integers(-2 * M, 12 * M, size=500)
    lat = rng.integers(-2 * M, 12 * M, size=500)
    got = points_in_polygon(lon, lat, holed)

    def scalar(px, py):
        crossings = 0
        for ring in holed.rings:
            c = ring.closed()
            for (x1, y1), (x2, y2) in zip(c[:-1], c[1:]):
                x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                if (
                    cross == 0
                    and min(x1, x2) <= px <= max(x1, x2)
                    and min(y1, y2) <= py <= max(y1, y2)
                ):
                    return True
                if (y1 > py) != (y2 > py):
                    xs = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                    if xs > px:
                        crossings += 1
        return crossings % 2 == 1

    want = np.array([scalar(int(a), int(b)) for a, b in zip(lon, lat)])
    assert (got == want).all()


def test_distance_and_buffer(square):
    lon = np.array([-M, 5 * M, 11 * M, 10 * M + 999_999, 10 * M + 1_000_001])
    lat = np.array([5 * M, 5 * M, 5 * M, 5 * M, 5 * M])
    d = distance_to_boundary(lon, lat, square)
    assert d[0] == pytest.approx(M)
    assert d[2] == pytest.approx(M)
    buf = points_in_buffered_polygon(lon, lat, square, 1_000_000)
    # closed buffer: distance == buffer (index 2, exactly 0.1°) is inside
    assert list(buf) == [True, True, True, True, False]


def test_buffer_inside_hole(holed):
    # center of the 3M-wide hole is 1.5M from the hole boundary -> outside
    # buffer; a point 0.5M into the hole is within 0.1M..1M of the edge
    assert not points_in_buffered_polygon(
        np.array([45 * M // 10]), np.array([45 * M // 10]), holed, 1_000_000
    )[0]
    assert points_in_buffered_polygon(
        np.array([3 * M + 500_000]), np.array([45 * M // 10]), holed, 1_000_000
    )[0]


def test_bbox_intersects(square):
    # disjoint, overlapping, contained, containing, touching
    minlon = np.array([11 * M, 9 * M, 4 * M, -1 * M, 10 * M])
    minlat = np.array([0, 0, 4 * M, -1 * M, 0])
    maxlon = np.array([12 * M, 12 * M, 5 * M, 11 * M, 12 * M])
    maxlat = np.array([M, M, 5 * M, 11 * M, M])
    got = bbox_intersects_polygon(minlon, minlat, maxlon, maxlat, square)
    assert list(got) == [False, True, True, True, True]


def test_degenerate_bboxes(square):
    # the reference's degenerate tests: point-bbox and line-bbox on the
    # boundary intersect (/root/reference/src/osmgeom.rs:195-220)
    got = bbox_intersects_polygon(
        np.array([10 * M, 10 * M, 5 * M]),
        np.array([5 * M, 5 * M, 10 * M]),
        np.array([10 * M, 12 * M, 5 * M]),
        np.array([5 * M, 5 * M, 12 * M]),
        square,
    )
    assert list(got) == [True, True, True]


def test_canarias_reference_goldens():
    """The reference's canarias .poly goldens
    (/root/reference/src/osmgeom.rs:125-221): 9 island rings with exact
    vertex counts, the pinned inside/outside points, and every
    degenerate bbox-intersects case (point / line / rect, inside and
    outside)."""
    import os

    from osm_replication_rust_spark.functions.geometry import (
        bbox_intersects_polygon,
        points_in_polygon,
    )
    from osm_replication_rust_spark.sources.poly import parse_poly

    path = "/root/reference/tests/resources/canarias.poly"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    with open(path) as f:
        mp = parse_poly(f.read(), "canarias")
    assert [len(r.coords) for r in mp.rings] == [8, 55, 9, 61, 69, 72, 24, 33, 29]
    assert not any(r.hole for r in mp.rings)

    def pip(lon, lat):
        return bool(points_in_polygon(np.array([lon]), np.array([lat]), mp)[0])

    assert pip(0, 0) is False
    assert pip(-166015000, 281876000) is True

    def bbi(minlat, maxlat, minlon, maxlon):
        return bool(
            bbox_intersects_polygon(
                np.array([minlon]), np.array([minlat]),
                np.array([maxlon]), np.array([maxlat]), mp,
            )[0]
        )

    # osmgeom.rs:150-221, same order
    assert bbi(-266015000, 0, -366015000, -266015000) is False  # rect outside
    assert bbi(0, 0, 0, 0) is False                             # point outside
    assert bbi(0, 0, -166015200, -166015100) is False           # line outside
    assert bbi(0, 281876000, -166015000, 0) is True             # rect overlap
    assert bbi(281875000, 281876000, -166015200, -166015100) is True
    assert bbi(281876000, 281876000, -166015100, -166015100) is True  # point inside
    assert bbi(281875000, 281876000, -166015100, -166015100) is True  # v-line
    assert bbi(281876000, 281876000, -166015200, -166015100) is True  # h-line


def test_haversine_known_distances(spark):
    import math

    from pyspark.sql import functions as F

    from osm_replication_rust_spark.functions.geometry import (
        EARTH_RADIUS_KM,
        haversine_km,
    )

    # (lat1, lon1, lat2, lon2) in degrees -> expected km (analytic)
    quarter = math.pi / 2 * EARTH_RADIUS_KM
    cases = [
        (0.0, 0.0, 0.0, 90.0, quarter),          # equator quarter arc
        (0.0, 0.0, 90.0, 0.0, quarter),          # pole arc
        (0.0, 0.0, 0.0, 180.0, 2 * quarter),     # antipodal on equator
        (0.0, 10.0, 0.0, 10.0, 0.0),             # identical point
        (48.8566, 2.3522, 40.7128, -74.0060, 5837.2),  # Paris-NYC ~5837 km
    ]
    df = spark.createDataFrame(
        [
            (i, int(a * 1e7), int(b * 1e7), int(c * 1e7), int(d * 1e7))
            for i, (a, b, c, d, _) in enumerate(cases)
        ],
        "i long, lat1 long, lon1 long, lat2 long, lon2 long",
    )
    got = {
        r.i: r.km
        for r in df.select(
            "i",
            haversine_km(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            ).alias("km"),
        ).collect()
    }
    for i, (_, _, _, _, want) in enumerate(cases):
        assert got[i] == pytest.approx(want, abs=1.0), (i, got[i], want)
