"""Quantify the buffer-semantics deviation the round-2 review flagged:
the engine's default buffered membership is EXACT distance <= 0.1°,
while the reference buffers with GEOS buffer(0.1°, quad_segs=8)
(/root/reference/src/osmxml/filter.rs:44-56) — an inscribed 8-segment
arc whose chords sit up to (1 - cos(pi/32)) * d ≈ 0.48% of d INSIDE the
true arc near convex corners. These tests implement the chord mode and
ENUMERATE the sliver on the fixtures."""

import gzip
import math
import os
import re

import numpy as np
import pytest

from osm_replication_rust_spark.functions.geometry import (
    BUFFER_DECIMICRO,
    buffer_sliver_mask,
    points_in_buffered_polygon,
    points_in_buffered_polygon_8seg,
    points_in_polygon,
)

SAGITTA = 1.0 - math.cos(math.pi / 32)  # 8 segs per quadrant


def _ring_samples(mp, n_per_edge=40, dists=(0.990, 0.9952, 0.997, 1.0, 1.003)):
    """Deterministic points laid around every edge's outward normals at
    fractions of the buffer width — a dense probe of the sliver band."""
    x1, y1, x2, y2 = mp.edges()
    pts = []
    rng = np.random.default_rng(7)
    for i in range(len(x1)):
        dx, dy = x2[i] - x1[i], y2[i] - y1[i]
        L = math.hypot(dx, dy)
        if L == 0:
            continue
        nx, ny = -dy / L, dx / L
        for t in rng.uniform(-0.2, 1.2, n_per_edge):
            px = x1[i] + t * dx
            py = y1[i] + t * dy
            for f in dists:
                for sgn in (1, -1):
                    pts.append(
                        (
                            int(px + sgn * nx * f * BUFFER_DECIMICRO),
                            int(py + sgn * ny * f * BUFFER_DECIMICRO),
                        )
                    )
    arr = np.asarray(pts, dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def test_8seg_is_subset_of_exact(regions):
    """The chord-approximated buffer is INSCRIBED: it can never accept a
    point the exact distance rule rejects."""
    for mp in regions:
        lon, lat = _ring_samples(mp)
        exact = points_in_buffered_polygon(lon, lat, mp)
        seg8 = points_in_buffered_polygon_8seg(lon, lat, mp)
        assert not (seg8 & ~exact).any()
        # and both agree with plain membership inside
        inp = points_in_polygon(lon, lat, mp)
        assert (seg8 | ~inp).all()


def test_sliver_band_is_tight(regions):
    """Every disagreement point lies in the annulus
    (d*cos(pi/32), d] of the boundary — i.e. within the chord sagitta —
    and agreement is total outside it."""
    from osm_replication_rust_spark.functions.geometry import distance_to_boundary

    n_sliver = 0
    for mp in regions:
        lon, lat = _ring_samples(mp)
        sliver = buffer_sliver_mask(lon, lat, mp)
        n_sliver += int(sliver.sum())
        if not sliver.any():
            continue
        d = distance_to_boundary(lon[sliver], lat[sliver], mp)
        inp = points_in_polygon(lon[sliver], lat[sliver], mp)
        assert not inp.any()
        assert (d <= BUFFER_DECIMICRO).all()
        assert (d > BUFFER_DECIMICRO * (1.0 - SAGITTA)).all()
    assert n_sliver > 0  # the probe must actually exercise the band


def test_sliver_enumeration_fixture_points(regions, images_pdf):
    """The deviation, quantified on the actual fixture point set: how
    many of the 2000 synthetic footprints classify differently under
    exact-distance vs GEOS-8seg buffering. Golden: 0 — the fixtures
    never land in the 0.48%-of-0.1° corner sliver, so the engine's
    default semantics match the reference ON ALL FIXTURE DATA and the
    deviation is bounded to the documented annulus."""
    from osm_replication_rust_spark.functions.coords import (
        LAT_OFFSET,
        LON_OFFSET,
        PHASH_LON_BASE,
    )

    lat = (images_pdf.phash // PHASH_LON_BASE - LAT_OFFSET).to_numpy(np.int64)
    lon = (images_pdf.phash % PHASH_LON_BASE - LON_OFFSET).to_numpy(np.int64)
    total = 0
    for mp in regions:
        total += int(buffer_sliver_mask(lon, lat, mp).sum())
    assert total == 0


REF = "/root/reference/tests/resources"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference fixtures absent")
def test_sliver_enumeration_reference_fixture():
    """Same enumeration over the reference's own test inputs: the five
    saint_barthelemy diff nodes vs its .poly. Golden: 0 disagreements
    (so our exact-rule classification of that fixture equals the
    reference's GEOS-buffered one row-for-row)."""
    from osm_replication_rust_spark.sources.poly import parse_poly

    with open(f"{REF}/saint_barthelemy.poly") as f:
        mp = parse_poly(f.read(), "sb")
    osc = gzip.decompress(open(f"{REF}/saint_barthelemy.osc.gz", "rb").read()).decode()
    coords = [
        (float(m.group(2)), float(m.group(1)))
        for m in re.finditer(r'<node id="\d+"[^>]*lat="([\d.\-]+)" lon="([\d.\-]+)"', osc)
    ]
    lon = np.asarray([int(round(c[0] * 1e7)) for c in coords], dtype=np.int64)
    lat = np.asarray([int(round(c[1] * 1e7)) for c in coords], dtype=np.int64)
    assert int(buffer_sliver_mask(lon, lat, mp).sum()) == 0
