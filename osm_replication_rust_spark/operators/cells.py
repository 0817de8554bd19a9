"""Region -> covering-cells computation (the discretization half of the
cell-prefilter spatial join).

The reference tests every element against every region polygon in a
nested loop, one full diff pass per region
(/root/reference/src/diffs.rs:113-131). At 10^12 rows that is a
non-starter; we discretize each region into grid cells ONCE on the
driver (regions are small: a `.poly` hierarchy is tens-to-thousands of
polygons) and broadcast the (region_id, cell, kind) table, turning the
spatial join into a single equi-join + exact refine of boundary cells.

Cell classification:
- ``full``     — cell entirely inside the polygon: membership decided by
                 the join alone, no per-point geometry (the fast path —
                 for a large region almost all covered cells are full).
- ``partial``  — cell touches the (buffered) boundary: points joined to
                 these cells go through the exact int64 point-in-polygon
                 refine (an Arrow-batched numpy kernel).
Cells entirely outside the buffered polygon are simply absent, so
non-matching points never leave the hash join (partition-pruning analog).

Conservativeness: a cell is marked partial if it lies within the
bbox (expanded by buffer + one cell) of ANY polygon edge. Cells not
near any edge are uniformly inside/outside both the polygon and its
buffer, so a single center-point test classifies them exactly.
"""

from __future__ import annotations

import numpy as np

from ..functions.coords import (
    DEFAULT_RES,
    LAT_OFFSET,
    LON_OFFSET,
    Y_STRIDE,
    cell_edge,
)
from ..functions.geometry import MultiPolygon, points_in_polygon


def cover_cells(
    mp: MultiPolygon, res: int = DEFAULT_RES, buffer: int = 0
) -> list[tuple[int, bool]]:
    """Covering cells of ``buffer(mp, buffer)``.

    Returns ``[(cell_id, full)]`` where ``full=True`` means the cell is
    entirely inside the *unbuffered* polygon.
    """
    edge = cell_edge(res)
    minx, miny, maxx, maxy = mp.bbox
    cx0 = (minx - buffer + LON_OFFSET) >> res
    cx1 = (maxx + buffer + LON_OFFSET) >> res
    cy0 = (miny - buffer + LAT_OFFSET) >> res
    cy1 = (maxy + buffer + LAT_OFFSET) >> res

    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    # partial mask over the local cell grid: a cell is partial iff it
    # intersects some edge's bbox expanded by exactly `buffer` — then any
    # untouched cell has distance > buffer from every edge, so it is
    # uniformly inside/outside both the polygon and its buffer, and the
    # center test below classifies it exactly. (>> res of the expanded
    # bounds already yields the intersecting-cell index range.)
    partial = np.zeros((ny, nx), dtype=bool)
    margin = buffer
    ex1, ey1, ex2, ey2 = mp.edges()
    for x1, y1, x2, y2 in zip(ex1, ey1, ex2, ey2):
        gx0 = max((min(x1, x2) - margin + LON_OFFSET) >> res, cx0)
        gx1 = min((max(x1, x2) + margin + LON_OFFSET) >> res, cx1)
        gy0 = max((min(y1, y2) - margin + LAT_OFFSET) >> res, cy0)
        gy1 = min((max(y1, y2) + margin + LAT_OFFSET) >> res, cy1)
        if gx1 >= gx0 and gy1 >= gy0:
            partial[gy0 - cy0 : gy1 - cy0 + 1, gx0 - cx0 : gx1 - cx0 + 1] = True

    # classify non-partial cells by their center point (exactly inside or
    # exactly outside the buffered polygon — see module docstring)
    free_y, free_x = np.nonzero(~partial)
    out: list[tuple[int, bool]] = []
    if free_y.size:
        ctr_lon = ((free_x + cx0) << res) + edge // 2 - LON_OFFSET
        ctr_lat = ((free_y + cy0) << res) + edge // 2 - LAT_OFFSET
        inside = points_in_polygon(ctr_lon, ctr_lat, mp)
        for fx, fy in zip(free_x[inside], free_y[inside]):
            out.append((int((fy + cy0) * Y_STRIDE + (fx + cx0)), True))

    py, px = np.nonzero(partial)
    for fx, fy in zip(px, py):
        out.append((int((fy + cy0) * Y_STRIDE + (fx + cx0)), False))
    return out


def cover_rows(
    regions: list[MultiPolygon], res: int = DEFAULT_RES, buffer: int = 0
) -> list[dict]:
    """Rows for the broadcastable cover DataFrame."""
    rows = []
    for mp in regions:
        for cell, full in cover_cells(mp, res, buffer):
            rows.append({"region_id": mp.region_id, "cell": cell, "full": full})
    return rows


def hex_bin(df, x: str = "lon", y: str = "lat", a: int = 1_000_000, b: int = 866_025):
    """Hexagonal binning (the H3-flavored aggregation cell): every
    point is assigned to the Voronoi cell of an INTEGER offset lattice
    — centers at ``(q·a + (r odd ? a/2 : 0), r·b)`` — whose cells are
    hexagons (near-regular at b ≈ a·√3/2; an EXACTLY regular hex grid
    has irrational centers on the decimicro grid, the same
    impossibility as the 22.5°-offset aspect rose, so near-regular +
    exact beats regular + floaty).  Assignment is EXACT integer
    geometry: the nearest center provably lies among the 4 candidates
    (r ∈ {⌊y/b⌋, +1} × q ∈ {⌊(x−off)/a⌋, +1}) because the third row is
    ≥ b away while any candidate is ≤ √((a/2)² + (b/2)²) < b away
    (holds whenever b > a/√3, true at the default near-regular pitch);
    ties break to the smallest (d², r, q) struct order.

    ``a`` must be even (the odd-row offset is a/2).  Adds ``hq, hr``
    (offset coordinates of the owning hex).  Pure codegen expressions
    — floor divisions use the euclidean spelling shared with DuckDB's
    ``//``, and the negative-safe parity is ((r % 2) + 2) % 2 in both
    engines."""
    from pyspark.sql import functions as F

    if a % 2 != 0:
        raise ValueError(f"hex pitch a must be even, got {a}")
    if 3 * b * b <= a * a:
        raise ValueError(
            f"b must exceed a/sqrt(3) for the 4-candidate bound: a={a} b={b}"
        )

    def _fdiv(col, n):
        s = col.cast("long")
        nn = F.lit(int(n)).cast("long")
        return F.call_function("div", s - (((s % nn) + nn) % nn), nn)

    px, py = F.col(x).cast("long"), F.col(y).cast("long")
    ry = _fdiv(py, b)
    cands = []
    for dr in (0, 1):
        r = ry + F.lit(dr)
        rm = ((r % 2) + 2) % 2
        off = rm * (a // 2)
        qf = _fdiv(px - off, a)
        for dq in (0, 1):
            q = qf + F.lit(dq)
            cx = q * a + off
            cy = r * b
            d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
            cands.append(
                F.struct(d2.alias("d2"), r.alias("r"), q.alias("q"))
            )
    best = F.array_min(F.array(*cands))
    return df.withColumn("hq", best["q"]).withColumn("hr", best["r"])


def sql_hex_bin(x: str, y: str, a: int = 1_000_000, b: int = 866_025) -> str:
    """DuckDB twin of ``hex_bin`` as a scalar struct expression
    ``{q:..., r:...}``: the same 4 candidates via list comprehension +
    list_min under the same (d2, r, q) struct order.  DuckDB's integer
    ``//`` TRUNCATES toward zero on negatives (unlike its float ``//``)
    — every division here uses the euclidean spelling, which makes the
    numerator exactly divisible so truncation == floor."""

    def fdiv(s: str, n: int) -> str:
        return f"((({s}) - (((({s}) % {n}) + {n}) % {n})) // {n})"

    half = a // 2
    items = []
    for dr in (0, 1):
        r = f"({fdiv(y, b)} + {dr})"
        rm = f"((({r} % 2) + 2) % 2)"
        off = f"({rm} * {half})"
        qf = fdiv(f"({x}) - {off}", a)
        for dq in (0, 1):
            q = f"({qf} + {dq})"
            cx = f"({q} * {a} + {off})"
            cy = f"({r} * {b})"
            d2 = (
                f"((({x}) - {cx}) * (({x}) - {cx})"
                f" + (({y}) - {cy}) * (({y}) - {cy}))"
            )
            items.append(f"{{'d2': {d2}, 'r': {r}, 'q': {q}}}")
    return f"list_min([{', '.join(items)}])"
