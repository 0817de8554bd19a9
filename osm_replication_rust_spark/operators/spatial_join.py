"""Cell-prefilter spatial join: points x region multipolygons.

This is the engine's flagship operator — the set-based re-expression of
the reference's per-element polygon filter
(/root/reference/src/osmxml/filter.rs:118-192, driven per-region by
/root/reference/src/diffs.rs:113-131). Shape:

1. encode each point's cell id — pure JVM integer arithmetic
   (functions/coords.cell_id), stays in whole-stage codegen;
2. equi-join against the broadcast (region_id, cell, full) cover table
   (operators/cells.py) — a broadcast hash join, NO shuffle of the big
   side; non-matching points are eliminated inside the join;
3. rows landing in ``full`` cells are decided by the join alone;
4. rows landing in ``partial`` (boundary) cells go through ONE
   Arrow-batched numpy kernel that computes exact int64
   point-in-polygon and buffered membership per region.

Scale notes (100 TB / 1000 executors):
- the big side is never shuffled: cell encode is a map, the join is
  broadcast, the refine is a map. The whole operator is one stage.
- region skew is irrelevant (broadcast side); *point* skew (mega-cells)
  doesn't matter either because there is no shuffle by cell — cells are
  only a join key into the broadcast table.
- the broadcast cover table grows with region count x resolution; keep
  res coarse enough that it stays ~10^5-10^6 rows (tune res per region
  size; finer res = fewer partial rows to refine but bigger broadcast).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.coords import DEFAULT_RES, cell_id
from ..functions.geometry import (
    BUFFER_DECIMICRO,
    MultiPolygon,
    points_in_buffered_polygon,
    points_in_polygon,
)
from .cells import cover_rows

_COVER_SCHEMA = T.StructType(
    [
        T.StructField("region_id", T.StringType(), False),
        T.StructField("region_idx", T.IntegerType(), False),
        T.StructField("cell", T.LongType(), False),
        T.StructField("full", T.BooleanType(), False),
    ]
)


def cover_df(
    spark: SparkSession,
    regions: list[MultiPolygon],
    res: int = DEFAULT_RES,
    buffer: int = 0,
) -> DataFrame:
    """Covering cells of every region, with a dense integer region index:
    the refine kernel keys on the int (vectorized batch grouping), the
    string region_id rides along only for the final output."""
    idx = {mp.region_id: i for i, mp in enumerate(regions)}
    rows = [
        {**r, "region_idx": idx[r["region_id"]]} for r in cover_rows(regions, res, buffer)
    ]
    # via pandas -> Arrow: a columnar local relation, not a Python RDD
    pdf = pd.DataFrame(rows, columns=["region_id", "region_idx", "cell", "full"])
    return spark.createDataFrame(pdf, schema=_COVER_SCHEMA)


def _membership_udf(
    spark: SparkSession,
    regions: list[MultiPolygon],
    buffer: int,
    buffer_mode: str = "exact",
):
    """Arrow-batched membership kernel. The region geometries ride a Spark
    broadcast variable (pickled once per executor, not per task); the
    batch is grouped by the dense integer region index (numpy sort-based
    grouping — no python string comparisons in the hot path).

    ``buffer_mode``: 'exact' tests distance <= buffer (the default);
    '8seg' reproduces the reference's GEOS buffer(d, quad_segs=8)
    chord-approximated region (functions.geometry.
    points_in_buffered_polygon_8seg) — see buffer_sliver_mask for the
    quantified difference."""
    from ..functions.geometry import points_in_buffered_polygon_8seg

    if buffer_mode not in ("exact", "8seg"):
        raise ValueError(f"buffer_mode must be exact|8seg, got {buffer_mode!r}")
    buffered_fn = (
        points_in_buffered_polygon
        if buffer_mode == "exact"
        else points_in_buffered_polygon_8seg
    )
    geo_bc = spark.sparkContext.broadcast(list(regions))

    schema = T.StructType(
        [
            T.StructField("in_poly", T.BooleanType(), False),
            T.StructField("in_buffer", T.BooleanType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def member(region_idx: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        import numpy as np

        geos = geo_bc.value
        ridx = region_idx.to_numpy("int64")
        lon_np = lon.to_numpy("int64")
        lat_np = lat.to_numpy("int64")
        out_poly = np.zeros(len(ridx), dtype=bool)
        out_buf = np.zeros(len(ridx), dtype=bool)
        for rix in np.unique(ridx):
            mp = geos[rix]
            ii = np.nonzero(ridx == rix)[0]
            inp = points_in_polygon(lon_np[ii], lat_np[ii], mp)
            out_poly[ii] = inp
            if buffer:
                out_buf[ii] = inp | buffered_fn(lon_np[ii], lat_np[ii], mp, buffer)
            else:
                out_buf[ii] = inp
        return pd.DataFrame({"in_poly": out_poly, "in_buffer": out_buf})

    # deterministic in truth, but marked nondeterministic ON PURPOSE:
    # otherwise Catalyst substitutes the UDF into every expression that
    # references the struct (filter + projection), producing TWO chained
    # ArrowEvalPython stages — measured 20x slower on the refine path.
    # Nondeterministic expressions are never duplicated or pushed into.
    return member.asNondeterministic()


def _auto_strategy(spark: SparkSession) -> str:
    """Default refine strategy by deployment topology: Arrow numpy
    kernel in a single JVM (``local[N]`` — fastest measured there,
    no multi-executor scaling question), compiled JVM expressions on
    every multi-executor master (the certified-scaling configuration,
    BENCH.md round-3 iso-load decomposition: 0.96 engine-attributable
    N->4N efficiency)."""
    return _auto_strategy_for_master(spark.conf.get("spark.master", ""))


def _auto_strategy_for_master(master: str) -> str:
    # "local" / "local[N]" / "local[*]" are one JVM; "local-cluster[...]",
    # "spark://", "yarn", "k8s://" all run separate executor processes
    is_single_jvm = master == "local" or (
        master.startswith("local[") and not master.startswith("local-cluster")
    )
    return "udf" if is_single_jvm else "expr"


def assign_regions(
    points: DataFrame,
    regions: list[MultiPolygon],
    lon_col: str | Column = "lon",
    lat_col: str | Column = "lat",
    res: int = DEFAULT_RES,
    buffer: int = BUFFER_DECIMICRO,
    keep_cols: list[str] | None = None,
    strategy: str = "auto",
    buffer_mode: str = "exact",
) -> DataFrame:
    """Assign every point to every region whose buffered polygon contains
    it. Output: ``keep_cols + (region_id, in_poly, in_buffer)`` with one
    row per (point, matching region); points matching nothing produce no
    rows (they were 'dropped' in reference terms).

    ``strategy``: how boundary-cell rows are refined —
    - 'udf'  : Arrow-batched numpy kernel (vectorized over the batch)
    - 'expr' : geometry compiled to Catalyst expressions (pure JVM;
               raycast unrolled, buffer distance via F.exists HOF so
               the stage stays under the JVM 64 KB method limit)
    - 'auto' : resolved BY MASTER so the default config always runs
               the configuration whose scaling story is certified:
               * single-JVM ``local[N]`` masters -> 'udf' — MEASURED
                 faster there, not assumed: at 32 threads / 30M rows /
                 quiet host the numpy refine ran 26.3M rows/s vs
                 11.0M for the compiled expressions (the HOF buffer
                 loop is CodegenFallback; numpy amortizes per Arrow
                 batch). One process, no cross-executor scaling
                 question exists.
               * multi-executor masters (local-cluster, standalone,
                 yarn, k8s) -> 'expr' — the iso-load decomposition
                 (tools/bench_isoload.py, BENCH.md round 3) certifies
                 its engine-attributable N->4N scaling at 0.96>=0.8;
                 the Arrow path's multi-executor scaling could not be
                 certified on this host (bimodal independent-jobs arm)
                 and additionally shares each core budget between JVM
                 task threads, Arrow writers, and python workers.
               Pass an explicit strategy to override either choice.

    ``buffer_mode`` ('udf' strategy only): 'exact' = distance <= buffer;
    '8seg' = the reference's GEOS chord-approximated buffer (see
    _membership_udf). The 'expr' strategy compiles the exact rule.
    """
    from ..functions.geo_expr import membership_exprs

    spark = points.sparkSession
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    keep_cols = keep_cols or [c for c in points.columns]
    if strategy == "auto":
        strategy = _auto_strategy(spark)

    pts = points.withColumn("_cell", cell_id(lon, lat, res)).withColumn(
        "_lon", lon.cast("long")
    ).withColumn("_lat", lat.cast("long"))

    cov = cover_df(spark, regions, res, buffer)
    joined = pts.join(F.broadcast(cov), pts["_cell"] == cov["cell"], "inner")

    full = joined.filter(F.col("full")).select(
        *keep_cols,
        F.col("region_id"),
        F.lit(True).alias("in_poly"),
        F.lit(True).alias("in_buffer"),
    )

    boundary = joined.filter(~F.col("full"))
    if strategy == "expr" and buffer_mode != "exact":
        raise ValueError("buffer_mode='8seg' requires the 'udf' strategy")
    if strategy == "expr":
        in_poly, in_buf = membership_exprs(
            regions, F.col("region_idx"), F.col("_lon"), F.col("_lat"), buffer
        )
        partial = (
            boundary.withColumn("in_poly", in_poly)
            .withColumn("in_buffer", in_buf)
            .filter(F.col("in_buffer"))
            .select(*keep_cols, F.col("region_id"), "in_poly", "in_buffer")
        )
    else:
        member = _membership_udf(spark, regions, buffer, buffer_mode)
        partial = (
            boundary.withColumn(
                "_m", member(F.col("region_idx"), F.col("_lon"), F.col("_lat"))
            )
            .filter(F.col("_m.in_buffer"))
            .select(
                *keep_cols,
                F.col("region_id"),
                F.col("_m.in_poly").alias("in_poly"),
                F.col("_m.in_buffer").alias("in_buffer"),
            )
        )
    return full.unionByName(partial)


def hilbert_region_ranges(
    regions: list[MultiPolygon],
    res: int = DEFAULT_RES,
    buffer: int = 0,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Union of every region's (buffer-expanded) bbox Hilbert range
    cover, merged and budget-capped once globally — the scan-prune
    companion to ``assign_regions``. Superset by construction: every
    cell the cover join can match lies inside some region's buffered
    bbox, whose cover these ranges contain."""
    from ..functions.coords import hilbert_ranges

    raw: list[tuple[int, int]] = []
    for mp in regions:
        mnx, mny, mxx, mxy = mp.bbox
        raw.extend(
            hilbert_ranges(
                mnx - buffer,
                mny - buffer,
                mxx + buffer,
                mxy + buffer,
                res=res,
                max_ranges=max_ranges,
            )
        )
    raw.sort()
    merged: list[list[int]] = []
    for lo, hi in raw:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        gaps = [(merged[i + 1][0] - merged[i][1], i) for i in range(len(merged) - 1)]
        _, i = min(gaps)
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]


def hilbert_prefilter(
    points: DataFrame,
    regions: list[MultiPolygon],
    hil_col: str,
    res: int = DEFAULT_RES,
    buffer: int = BUFFER_DECIMICRO,
    max_ranges: int = 64,
) -> DataFrame:
    """Scan-level spatial prune for a table that PERSISTS a Hilbert id
    column (the layout ``functions/coords.with_hilbert`` +
    ``repartitionByRange(hil).sortWithinPartitions(hil)`` writes): keep
    only rows whose id falls in some region's cover range. The
    predicate is an OR-of-BETWEENs on one long column, so Catalyst
    pushes it into the parquet scan and min/max row-group pruning skips
    the data no region can match BEFORE any decode, join or Python —
    on a hilbert-clustered 100 TB table this is the difference between
    scanning the planet and scanning the neighborhoods under the
    regions. Strict superset of the cover join's matches (see
    hilbert_region_ranges), so
    ``assign_regions(hilbert_prefilter(df), ...)`` returns EXACTLY
    ``assign_regions(df, ...)`` — asserted in test_spatial_join."""
    from ..functions.coords import hilbert_range_predicate

    ranges = hilbert_region_ranges(regions, res=res, buffer=buffer, max_ranges=max_ranges)
    return points.filter(hilbert_range_predicate(F.col(hil_col), ranges))
