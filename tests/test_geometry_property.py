"""Property-based geometry tests (hypothesis): the vectorized kernel
must agree with an independent scalar ray-cast on arbitrary simple
polygons and arbitrary points — no Spark involved, pure numpy."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osm_replication_rust_spark.functions.geometry import (
    MultiPolygon,
    Ring,
    points_in_polygon,
)

M = 1_000_000


@st.composite
def star_polygon(draw):
    """Random star-shaped simple polygon around a random center:
    sorted angles + random radii guarantee no self-intersection."""
    k = draw(st.integers(3, 12))
    cx = draw(st.integers(-20 * M, 20 * M))
    cy = draw(st.integers(-20 * M, 20 * M))
    angles = sorted(
        draw(
            st.lists(
                st.floats(0, 2 * np.pi, allow_nan=False), min_size=k, max_size=k, unique=True
            )
        )
    )
    radii = draw(st.lists(st.integers(M // 2, 10 * M), min_size=k, max_size=k))
    pts = [
        (int(cx + r * np.cos(a)), int(cy + r * np.sin(a)))
        for a, r in zip(angles, radii)
    ]
    return MultiPolygon("h", [Ring(np.array(pts + [pts[0]], dtype=np.int64))])


def scalar_raycast(mp, px, py):
    crossings = 0
    for ring in mp.rings:
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
                # exact integer comparison of the crossing abscissa
                num = (x1 - px) * (y2 - y1) + (py - y1) * (x2 - x1)
                if (num > 0) == (y2 > y1) and num != 0:
                    crossings += 1
    return crossings % 2 == 1


@settings(max_examples=60, deadline=None)
@given(
    star_polygon(),
    st.lists(
        st.tuples(
            st.integers(-35 * M, 35 * M), st.integers(-35 * M, 35 * M)
        ),
        min_size=1,
        max_size=50,
    ),
)
def test_kernel_matches_scalar(mp, pts):
    lon = np.array([p[0] for p in pts], dtype=np.int64)
    lat = np.array([p[1] for p in pts], dtype=np.int64)
    got = points_in_polygon(lon, lat, mp)
    want = np.array([scalar_raycast(mp, int(a), int(b)) for a, b in pts])
    assert (got == want).all()


@settings(max_examples=30, deadline=None)
@given(star_polygon())
def test_vertices_are_inside(mp):
    c = mp.rings[0].coords
    got = points_in_polygon(c[:, 0], c[:, 1], mp)
    assert got.all()  # boundary (vertices) counts inside
