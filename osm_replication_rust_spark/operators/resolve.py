"""Closure resolution: way_full / relation_full as set-based joins.

Reference: ``read_way_full`` resolves a way's node list to coordinates
(/root/reference/src/osm.rs:203-214); ``read_relation_full`` resolves
members recursively with a cycle guard (/root/reference/src/osm.rs:219-246).

Spark shape (SURVEY.md S9/S10):
  posexplode(members) -> join the point table -> collect_list over a
  window ordered by member position (order preserved exactly);
  relations iterate type-discriminated joins to bounded depth.
Missing refs resolve to nothing (tolerated, like the bbox/filter paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_way_full(groups: DataFrame, points: DataFrame, point_id: str = "image_id") -> DataFrame:
    """(group_id, coords) with coords = ordered array<struct<lat,lon>>
    of resolved member points (ways only). Order = member position."""
    edges = (
        groups.filter(F.col("kind") == "way")
        .select("group_id", F.posexplode("members").alias("pos", "m"))
        .filter(F.col("m.type") == "image")
        .select("group_id", "pos", F.col("m.ref").alias("ref"))
    )
    pts = points.select(
        F.col(point_id).alias("ref"),
        F.struct(
            F.col("lat").cast("long").alias("lat"),
            F.col("lon").cast("long").alias("lon"),
        ).alias("pt"),
    )
    joined = edges.join(pts, "ref", "inner")
    # one hash-agg instead of two window passes: collect (pos, pt)
    # pairs, sort by position, strip the position — order preserved,
    # one shuffle, map-side partial agg applies
    return joined.groupBy("group_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "pt"))),
            lambda s: s["pt"],
        ).alias("coords")
    )


def resolve_relation_members(
    groups: DataFrame,
    points: DataFrame,
    point_id: str = "image_id",
    max_depth: int = 5,
) -> DataFrame:
    """Transitive closure: (group_id, member_id, depth) — every point
    reachable from each relation through way/relation edges, bounded
    depth, cycle-safe (a back edge adds nothing new, the monotone
    frontier empties). The set-based analog of relation_full."""
    edges = groups.select(
        "group_id", "kind", F.explode("members").alias("m")
    ).select(
        "group_id",
        "kind",
        F.col("m.ref").alias("ref"),
        F.col("m.type").alias("ref_type"),
    ).persist()

    point_ids = points.select(F.col(point_id).alias("ref"))

    rel_edges = edges.filter(F.col("kind") == "relation")
    # direct point members (depth 1); group members expand below
    reached = (
        rel_edges.filter(F.col("ref_type") == "image")
        .join(point_ids, "ref", "left_semi")
        .select("group_id", F.col("ref").alias("member_id"), F.lit(1).alias("depth"))
        .persist()
    )
    # frontier of group-typed refs still to expand: (root group, current node)
    frontier = rel_edges.filter(F.col("ref_type") == "group").select(
        "group_id", F.col("ref").alias("node")
    ).distinct().persist()

    all_edges = edges.select(
        F.col("group_id").alias("node"),
        F.col("ref"),
        F.col("ref_type"),
    )

    # cycle guard: accumulated visited set of (root, node) pairs — a
    # 2-cycle's back edge must be excepted against EVERY prior frontier,
    # not just the immediately-previous one, or it oscillates and is
    # re-expanded until max_depth
    visited = frontier

    for depth in range(2, max_depth + 2):
        if frontier.isEmpty():
            break
        step = frontier.join(all_edges, "node", "inner")
        new_pts = (
            step.filter(F.col("ref_type") == "image")
            .join(point_ids, "ref", "left_semi")
            .select("group_id", F.col("ref").alias("member_id"), F.lit(depth).alias("depth"))
        )
        reached = reached.unionByName(new_pts).persist()
        frontier = (
            step.filter(F.col("ref_type") == "group")
            .select("group_id", F.col("ref").alias("node"))
            .distinct()
            .exceptAll(visited)
            .persist()
        )
        visited = visited.unionByName(frontier).persist()

    w = Window.partitionBy("group_id", "member_id").orderBy("depth")
    return (
        reached.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("group_id", "member_id", "depth")
    )
