"""Way-geometry clipping to tile extents (polygon-extract splitting).

The reference splits its per-region extracts by intersecting element
geometry with a region's bounding box turned into a polygon
(/root/reference/src/osmgeom.rs:65-71 bounding_box_to_polygon; the
per-region extract loop in src/diffs.rs drives it).  Re-expressed
Spark-first: every resolved way chain is exploded into its segments,
each segment is fanned out to the grid tiles its bbox covers, and each
(segment, tile) pair is clipped with Liang–Barsky — pure min/max/
mul/div arithmetic, fully inside whole-stage codegen.  No Python in
the plan at all; the only shuffle is the way-closure aggregate that
produces the chains.

Scale shape (100 TB): segment fan-out is bounded by the segment's own
tile span (OSM ways are local — almost always 1-2 tiles per segment),
so the explode is map-side and output-proportional.  Tiles never
materialize as a dimension table: tile extents are arithmetic on the
tile index, so there is nothing to join or broadcast.  Skewed mega-
tiles cost nothing here — rows are per (segment, tile), not per tile.

The clip parameterization (same IEEE tree in the DuckDB twin, see
plans/entry_queries.py clip_to_tiles):

    t0 = max(0, tx_lo, ty_lo)   t1 = min(1, tx_hi, ty_hi)

with per-axis entering/leaving parameters from the clamped division,
and the axis-parallel / degenerate cases (dx == 0) resolved by CASE
to (0,1) when inside the slab, (2,-1) = empty when outside.  A pair
with t0 <= t1 yields the clipped piece endpoints x1 + t*dx — shared
boundary points land in BOTH adjacent tiles, which is exactly what an
extract-splitter wants (each tile's extract is self-contained).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import coords as C
from .resolve import resolve_way_full


def _axis_interval(d, p1, lo, hi):
    """(t_lo, t_hi) for one axis slab [lo, hi]: the parameter interval
    where p1 + t*d is inside the slab. Degenerate axis (d == 0) maps to
    (0, 1) inside / (2, -1) outside so the final max/min test rejects.
    All doubles; division only happens on the d != 0 branch."""
    inside = (p1 >= lo) & (p1 <= hi)
    a = (lo - p1) / d
    b = (hi - p1) / d
    t_lo = F.when(d != 0.0, F.least(a, b)).otherwise(
        F.when(inside, F.lit(0.0)).otherwise(F.lit(2.0))
    )
    t_hi = F.when(d != 0.0, F.greatest(a, b)).otherwise(
        F.when(inside, F.lit(1.0)).otherwise(F.lit(-1.0))
    )
    return t_lo, t_hi


def way_segments(
    groups: DataFrame, points: DataFrame, point_id: str = "image_id"
) -> DataFrame:
    """(group_id, pos, x1, y1, x2, y2) — consecutive-vertex segments of
    every resolved way chain, decimicro ints; ``pos`` is the ORIGINAL
    member position of the segment's start vertex. Array-slice zip, no
    shuffle beyond the closure agg."""
    ways = resolve_way_full(groups, points, point_id, keep_pos=True)
    c = F.col("coords")
    segs = F.zip_with(
        F.slice(c, 1, F.greatest(F.size(c) - 1, F.lit(0))),
        F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0))),
        lambda a, b: F.struct(
            a["pos"].alias("pos"),
            a["lon"].alias("x1"),
            a["lat"].alias("y1"),
            b["lon"].alias("x2"),
            b["lat"].alias("y2"),
        ),
    )
    return (
        ways.filter(F.size(c) >= 2)
        .select("group_id", F.explode(segs).alias("s"))
        .select("group_id", "s.pos", "s.x1", "s.y1", "s.x2", "s.y2")
    )


def clip_ways_to_tiles(
    groups: DataFrame,
    points: DataFrame,
    res: int = C.DEFAULT_RES,
    point_id: str = "image_id",
) -> DataFrame:
    """Split every way into per-tile segment pieces at grid resolution
    ``res``: (group_id, pos, tx, ty, cx1, cy1, cx2, cy2) with c* the
    clipped endpoints (double, decimicro scale). A segment appears once
    per tile its clipped extent touches; pieces on a shared tile edge
    appear in both tiles (self-contained extracts). Plan: closure agg →
    map-side segment/tile explode → codegen Liang–Barsky filter+project.
    """
    edge = C.cell_edge(res)
    segs = way_segments(groups, points, point_id)
    tiled = (
        segs.withColumn(
            "tx",
            F.explode(
                F.sequence(
                    F.shiftright(F.least("x1", "x2") + C.LON_OFFSET, res),
                    F.shiftright(F.greatest("x1", "x2") + C.LON_OFFSET, res),
                )
            ),
        )
        .withColumn(
            "ty",
            F.explode(
                F.sequence(
                    F.shiftright(F.least("y1", "y2") + C.LAT_OFFSET, res),
                    F.shiftright(F.greatest("y1", "y2") + C.LAT_OFFSET, res),
                )
            ),
        )
    )
    x1 = F.col("x1").cast("double")
    y1 = F.col("y1").cast("double")
    dx = (F.col("x2") - F.col("x1")).cast("double")
    dy = (F.col("y2") - F.col("y1")).cast("double")
    # tile extents: exact ints (< 2^53) cast to double
    xmin = (F.col("tx") * edge - F.lit(C.LON_OFFSET)).cast("double")
    ymin = (F.col("ty") * edge - F.lit(C.LAT_OFFSET)).cast("double")
    xmax = xmin + F.lit(float(edge))
    ymax = ymin + F.lit(float(edge))
    tx_lo, tx_hi = _axis_interval(dx, x1, xmin, xmax)
    ty_lo, ty_hi = _axis_interval(dy, y1, ymin, ymax)
    t0 = F.greatest(F.lit(0.0), tx_lo, ty_lo)
    t1 = F.least(F.lit(1.0), tx_hi, ty_hi)
    return (
        tiled.withColumn("t0", t0)
        .withColumn("t1", t1)
        .filter(F.col("t0") <= F.col("t1"))
        .select(
            "group_id",
            "pos",
            "tx",
            "ty",
            (x1 + F.col("t0") * dx).alias("cx1"),
            (y1 + F.col("t0") * dy).alias("cy1"),
            (x1 + F.col("t1") * dx).alias("cx2"),
            (y1 + F.col("t1") * dy).alias("cy2"),
        )
    )


def densify_segments(segs: DataFrame, max_gap: int) -> DataFrame:
    """ST_Segmentize's core: per segment, the evenly spaced intermediate
    vertices that keep every gap <= ``max_gap`` (coordinate units).
    Returns (group_id, pos, j, px, py) — j = 1..n_sub-1 with
    n_sub = max(ceil(len / max_gap), 1); original vertices are NOT
    re-emitted (callers union them if they want the densified chain).

    Cross-engine determinism WITHOUT exact integers: each segment is
    subdivided independently — no cumulative arc-length state — so the
    only floats are one correctly-rounded sqrt/division per segment and
    the shared interpolation spelling x1 + (dx*j)/n_sub.  Identical
    IEEE inputs -> identical doubles in Spark and the DuckDB twin (the
    same reasoning as the Liang–Barsky clip tree above; a cumulative
    resampling would instead hit engine-specific summation orders).

    Scale shape: pure map-side codegen on the segment table — explode
    fan-out is output-proportional (the inserted points), no shuffle,
    no Python."""
    if max_gap < 1:
        raise ValueError(f"max_gap must be >= 1 coordinate unit, got {max_gap}")
    dx = (F.col("x2") - F.col("x1")).cast("double")
    dy = (F.col("y2") - F.col("y1")).cast("double")
    n_sub = F.greatest(
        F.ceil(F.sqrt(dx * dx + dy * dy) / F.lit(float(max_gap))), F.lit(1)
    )
    js = F.when(n_sub > 1, F.sequence(F.lit(1).cast("long"), n_sub - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    out = (
        segs.withColumn("_dx", dx)
        .withColumn("_dy", dy)
        .withColumn("_n_sub", n_sub)
        .select("group_id", "pos", "x1", "y1", "_dx", "_dy", "_n_sub",
                F.explode(js).alias("j"))
    )
    nd = F.col("_n_sub").cast("double")
    jd = F.col("j").cast("double")
    return out.select(
        "group_id",
        "pos",
        "j",
        (F.col("x1").cast("double") + (F.col("_dx") * jd) / nd).alias("px"),
        (F.col("y1").cast("double") + (F.col("_dy") * jd) / nd).alias("py"),
    )
