"""clip_ways_to_tiles: Liang–Barsky per-tile way splitting;
densify_segments: ST_Segmentize's evenly-spaced vertex insertion."""

import math

import numpy as np
import pandas as pd
import pytest

from osm_replication_rust_spark.functions import coords as C
from osm_replication_rust_spark.operators.clip import (
    clip_ways_to_tiles,
    densify_segments,
    way_segments,
)

RES = 23
EDGE = C.cell_edge(RES)


def _mk(spark, pts, ways):
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": list(pts),
                "lat": [p[1] for p in pts.values()],
                "lon": [p[0] for p in pts.values()],
            }
        )
    )
    groups = spark.createDataFrame(
        [
            (gid, "way", [{"ref": r, "type": "image", "role": ""} for r in refs])
            for gid, refs in ways.items()
        ],
        "group_id string, kind string, members array<struct<ref:string,type:string,role:string>>",
    )
    return groups, points


def _ref_clip(x1, y1, x2, y2, tx, ty):
    """Plain-python Liang–Barsky reference (floats)."""
    xmin = float(tx * EDGE - C.LON_OFFSET)
    ymin = float(ty * EDGE - C.LAT_OFFSET)
    xmax, ymax = xmin + EDGE, ymin + EDGE
    x1, y1 = float(x1), float(y1)
    dx, dy = float(x2 - x1), float(y2 - y1)

    def axis(d, p, lo, hi):
        if d != 0.0:
            a, b = (lo - p) / d, (hi - p) / d
            return min(a, b), max(a, b)
        return (0.0, 1.0) if lo <= p <= hi else (2.0, -1.0)

    xlo, xhi = axis(dx, x1, xmin, xmax)
    ylo, yhi = axis(dy, y1, ymin, ymax)
    t0, t1 = max(0.0, xlo, ylo), min(1.0, xhi, yhi)
    if t0 > t1:
        return None
    return (x1 + t0 * dx, y1 + t0 * dy, x1 + t1 * dx, y1 + t1 * dy)


def test_clip_matches_reference_and_covers(spark):
    rng = np.random.default_rng(7)
    n = 40
    lon = rng.integers(-30_000_000, 30_000_000, n)
    lat = rng.integers(-30_000_000, 30_000_000, n)
    pts = {f"p{i}": (int(lon[i]), int(lat[i])) for i in range(n)}
    ways = {f"w{k}": [f"p{i}" for i in range(4 * k, 4 * k + 4)] for k in range(10)}
    groups, points = _mk(spark, pts, ways)

    out = clip_ways_to_tiles(groups, points, res=RES).collect()
    segs = {
        (r.group_id, r.pos): r
        for r in way_segments(groups, points).collect()
    }

    # 1) every piece matches the plain-python reference clip exactly
    seen = set()
    for r in out:
        s = segs[(r.group_id, r.pos)]
        ref = _ref_clip(s.x1, s.y1, s.x2, s.y2, r.tx, r.ty)
        assert ref is not None, (r.group_id, r.pos, r.tx, r.ty)
        assert (r.cx1, r.cy1, r.cx2, r.cy2) == ref
        # piece lies inside the tile extent (closed box, up to one ulp
        # of t*d rounding — the clip itself is bit-exact vs the oracle)
        xmin = r.tx * EDGE - C.LON_OFFSET
        ymin = r.ty * EDGE - C.LAT_OFFSET
        tol = 1e-3
        for x, y in [(r.cx1, r.cy1), (r.cx2, r.cy2)]:
            assert xmin - tol <= x <= xmin + EDGE + tol
            assert ymin - tol <= y <= ymin + EDGE + tol
        seen.add((r.group_id, r.pos, r.tx, r.ty))

    # 2) completeness: every tile the reference clip accepts is emitted
    for (gid, pos), s in segs.items():
        txa = (min(s.x1, s.x2) + C.LON_OFFSET) >> RES
        txb = (max(s.x1, s.x2) + C.LON_OFFSET) >> RES
        tya = (min(s.y1, s.y2) + C.LAT_OFFSET) >> RES
        tyb = (max(s.y1, s.y2) + C.LAT_OFFSET) >> RES
        for tx in range(txa, txb + 1):
            for ty in range(tya, tyb + 1):
                if _ref_clip(s.x1, s.y1, s.x2, s.y2, tx, ty) is not None:
                    assert (gid, pos, tx, ty) in seen

    # 3) pieces chain: within a segment, consecutive tiles share endpoints
    by_seg: dict = {}
    for r in out:
        by_seg.setdefault((r.group_id, r.pos), []).append(r)
    def param(r, s, x, y):
        return (x - s.x1) / (s.x2 - s.x1) if s.x2 != s.x1 else (y - s.y1) / (s.y2 - s.y1)

    for (gid, pos), rs in by_seg.items():
        s = segs[(gid, pos)]
        if s.x1 == s.x2 and s.y1 == s.y2:
            continue
        ivs = sorted(
            (param(r, s, r.cx1, r.cy1), param(r, s, r.cx2, r.cy2)) for r in rs
        )
        hi = 0.0
        for a, b in ivs:
            assert a <= hi + 1e-12
            hi = max(hi, b)
        assert hi >= 1.0 - 1e-12


@pytest.mark.parametrize(
    "a,b",
    [
        ((100, 100), (100, 200)),              # vertical, inside one tile
        ((100, 100), (EDGE * 3, 100)),         # horizontal, spans tiles
        ((0, 0), (0, 0)),                      # degenerate point segment
        ((EDGE - C.LON_OFFSET % EDGE, 5), (EDGE - C.LON_OFFSET % EDGE, 9000)),
    ],
)
def test_clip_degenerate_segments(spark, a, b):
    pts = {"a": a, "b": b}
    groups, points = _mk(spark, pts, {"w": ["a", "b"]})
    out = clip_ways_to_tiles(groups, points, res=RES).collect()
    assert out, "every segment must land in at least one tile"
    for r in out:
        ref = _ref_clip(a[0], a[1], b[0], b[1], r.tx, r.ty)
        assert ref == (r.cx1, r.cy1, r.cx2, r.cy2)


def _segs_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["group_id", "pos", "x1", "y1", "x2", "y2"])
    )


def _ref_densify(x1, y1, x2, y2, gap):
    """Plain-python reference: the same IEEE tree as the operator."""
    dx, dy = float(x2 - x1), float(y2 - y1)
    n = max(math.ceil(math.sqrt(dx * dx + dy * dy) / float(gap)), 1)
    return {
        j: (float(x1) + (dx * float(j)) / float(n), float(y1) + (dy * float(j)) / float(n))
        for j in range(1, n)
    }


def test_densify_matches_reference_bitwise(spark):
    rng = np.random.default_rng(11)
    rows = [
        (
            f"g{i}",
            0,
            int(rng.integers(-1_800_000_000, 1_800_000_000)),
            int(rng.integers(-900_000_000, 900_000_000)),
            int(rng.integers(-1_800_000_000, 1_800_000_000)),
            int(rng.integers(-900_000_000, 900_000_000)),
        )
        for i in range(30)
    ]
    gap = 100_000_000
    out = densify_segments(_segs_df(spark, rows), max_gap=gap).collect()
    got = {}
    for r in out:
        got.setdefault(r.group_id, {})[r.j] = (r.px, r.py)
    for gid, pos, x1, y1, x2, y2 in rows:
        ref = _ref_densify(x1, y1, x2, y2, gap)
        assert got.get(gid, {}) == ref, gid  # exact float equality


def test_densify_gap_bound_with_endpoints(spark):
    rows = [("g", 0, -300_000_000, -100_000_000, 355_000_001, 200_000_003)]
    gap = 50_000_000
    out = densify_segments(_segs_df(spark, rows), max_gap=gap).collect()
    pts = (
        [(float(rows[0][2]), float(rows[0][3]))]
        + [(r.px, r.py) for r in sorted(out, key=lambda r: r.j)]
        + [(float(rows[0][4]), float(rows[0][5]))]
    )
    assert len(pts) > 3, "long segment must densify"
    for (ax, ay), (bx, by) in zip(pts, pts[1:]):
        assert math.hypot(bx - ax, by - ay) <= gap * (1 + 1e-12)


def test_densify_short_and_degenerate_emit_nothing(spark):
    rows = [
        ("short", 0, 0, 0, 10, 10),           # len << gap -> n_sub = 1
        ("point", 1, 5, 5, 5, 5),             # zero-length
        ("exact", 2, 0, 0, 100_000_000, 0),   # len == gap exactly -> n_sub = 1
    ]
    out = densify_segments(_segs_df(spark, rows), max_gap=100_000_000).collect()
    assert out == []


def test_densify_reversed_segment_same_point_set(spark):
    # the inserted j-points of a reversed segment are the same chain
    # positions (j <-> n-j); values may differ by rounding, never by
    # placement — counts and integer-resolution positions agree
    fwd = [("f", 0, 0, 0, 777_000_000, 333_000_000)]
    rev = [("r", 0, 777_000_000, 333_000_000, 0, 0)]
    gap = 100_000_000
    a = densify_segments(_segs_df(spark, fwd), max_gap=gap).collect()
    b = densify_segments(_segs_df(spark, rev), max_gap=gap).collect()
    assert len(a) == len(b) > 0
    fa = sorted((round(r.px), round(r.py)) for r in a)
    fb = sorted((round(r.px), round(r.py)) for r in b)
    assert fa == fb


def test_clip_missing_ref_skips_vertex(spark):
    pts = {"a": (0, 0), "c": (10_000_000, 0)}
    groups, points = _mk(spark, pts, {"w": ["a", "ghost", "c"]})
    out = clip_ways_to_tiles(groups, points, res=RES).collect()
    # chain is a->c (ghost dropped); start pos of the single segment is 0
    assert {r.pos for r in out} == {0}
    assert {(r.cx1, r.cy1) for r in out if r.tx == (0 + C.LON_OFFSET) >> RES} \
        .issubset({(0.0, 0.0), (float((0 + C.LON_OFFSET >> RES) * EDGE - C.LON_OFFSET), 0.0)})


def test_densify_rejects_nonpositive_gap(spark):
    rows = [("g", 0, 0, 0, 10, 10)]
    for bad in (0, -5):
        with pytest.raises(ValueError):
            densify_segments(_segs_df(spark, rows), max_gap=bad)
