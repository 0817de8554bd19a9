"""clip_ways_to_tiles: Liang–Barsky per-tile way splitting."""

import numpy as np
import pandas as pd
import pytest

from osm_replication_rust_spark.functions import coords as C
from osm_replication_rust_spark.operators.clip import clip_ways_to_tiles, way_segments

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


def test_clip_missing_ref_skips_vertex(spark):
    pts = {"a": (0, 0), "c": (10_000_000, 0)}
    groups, points = _mk(spark, pts, {"w": ["a", "ghost", "c"]})
    out = clip_ways_to_tiles(groups, points, res=RES).collect()
    # chain is a->c (ghost dropped); start pos of the single segment is 0
    assert {r.pos for r in out} == {0}
    assert {(r.cx1, r.cy1) for r in out if r.tx == (0 + C.LON_OFFSET) >> RES} \
        .issubset({(0.0, 0.0), (float((0 + C.LON_OFFSET >> RES) * EDGE - C.LON_OFFSET), 0.0)})
