"""The engine's query catalog: every operator exposed through the driver
contract, each as (PySpark callable, DuckDB oracle SQL) built from shared
definitions so the arithmetic matches bit-for-bit.

Query keys map to SURVEY.md §2 operator ids in each docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import coords as C
from ..datagen.synth import fixture_regions
from ..operators.spatial_join import assign_regions

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: spatial join / tiling (S4+S5, P2, P3, J3, O1)
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> derived decimicro footprint -> cell-prefilter spatial
    join against the fixture region hierarchy -> (event_id, region_id,
    in_poly, in_buffer) tile assignments."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        C.derived_lat(F.col("event_id")).alias("lat"),
        C.derived_lon(F.col("event_id")).alias("lon"),
    )
    return assign_regions(
        ev, fixture_regions(), keep_cols=["event_id"]
    ).orderBy("event_id", "region_id")


# ---------------------------------------------------------------------------
# relational core (scan/filter/agg/join surface the reference exercises
# through its streaming passes; expressed over the driver star schema)
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           sum(l_extendedprice)                                  AS sum_base,
           sum(l_extendedprice * (1 - l_discount))               AS sum_disc,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                       AS avg_qty,
           count(*)                                              AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-style multi-agg (hash agg, partial+final) with pushdown filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc"),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "cell_encode",
    f"""
    SELECT cell, count(*) AS n_points
    FROM (
      SELECT {C.sql_cell_id(C.sql_derived_lon('event_id'), C.sql_derived_lat('event_id'))} AS cell
      FROM events
    )
    GROUP BY cell ORDER BY cell
    """,
)
def cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/J3 prefix: JVM-side cell-id encode (the H3/S2 analog) + count
    per cell. Pure integer arithmetic, whole-stage codegen."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            C.cell_id(
                C.derived_lon(F.col("event_id")), C.derived_lat(F.col("event_id"))
            ).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cell")
    )


@register(
    "footprint_roundtrip",
    f"""
    SELECT event_id,
           {C.sql_derived_lat('event_id')} AS lat,
           {C.sql_derived_lon('event_id')} AS lon,
           ({C.sql_derived_lat('event_id')} + {C.LAT_OFFSET}) * {C.PHASH_LON_BASE}
             + ({C.sql_derived_lon('event_id')} + {C.LON_OFFSET}) AS phash,
           {C.sql_unpack_lat(f"(({C.sql_derived_lat('event_id')} + {C.LAT_OFFSET}) * {C.PHASH_LON_BASE} + ({C.sql_derived_lon('event_id')} + {C.LON_OFFSET}))")} AS lat2
    FROM events ORDER BY event_id
    """,
)
def footprint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: decimicro footprint <-> phash pack/unpack round trip (the
    invertible packing of FIXTURES.md §1)."""
    ev = _t(spark, sf_dir, "events")
    lat = C.derived_lat(F.col("event_id"))
    lon = C.derived_lon(F.col("event_id"))
    ph = C.pack_footprint(lat, lon)
    return ev.select(
        "event_id",
        lat.alias("lat"),
        lon.alias("lon"),
        ph.alias("phash"),
        C.unpack_lat(ph).alias("lat2"),
    ).orderBy("event_id")


@register(
    "shard_path",
    f"""
    SELECT o_orderkey, {C.sql_shard_path('o_orderkey')} AS shard
    FROM orders ORDER BY o_orderkey
    """,
)
def shard_path_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: the reference's 9-digit 3/3/3 shard path
    (/root/reference/src/osmbin.rs:227-245) as a partitioning expression."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", C.shard_path(F.col("o_orderkey")).alias("shard")
    ).orderBy("o_orderkey")


@register(
    "bbox_agg",
    f"""
    SELECT user_id,
           min({C.sql_derived_lat('event_id')}) AS minlat,
           max({C.sql_derived_lat('event_id')}) AS maxlat,
           min({C.sql_derived_lon('event_id')}) AS minlon,
           max({C.sql_derived_lon('event_id')}) AS maxlon,
           count(*) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def bbox_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: bbox expand as min/max aggregation (reference
    /root/reference/src/osm.rs:155-171 folded per element set)."""
    ev = _t(spark, sf_dir, "events")
    lat = C.derived_lat(F.col("event_id"))
    lon = C.derived_lon(F.col("event_id"))
    return (
        ev.select("user_id", lat.alias("lat"), lon.alias("lon"))
        .groupBy("user_id")
        .agg(
            F.min("lat").alias("minlat"),
            F.max("lat").alias("maxlat"),
            F.min("lon").alias("minlon"),
            F.max("lon").alias("maxlon"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )
