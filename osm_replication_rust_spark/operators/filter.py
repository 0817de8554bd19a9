"""Three-way diff filter (the reference's core operator) + existential
group membership.

Reference semantics (/root/reference/src/osmxml/filter.rs:219-299, and
SURVEY.md §4.3):

  for each changed element, per region:
    in polygon            -> KEEP, original action
    in buffer(poly, 0.1°) -> KEEP, action forced to 'delete'
                             (soft boundary: consumers near the edge
                             must drop elements that drifted out)
    outside buffer        -> DROP (no output row)

The reference runs this as a recursive cascade, re-filtering the
parent's output per child region (/root/reference/src/diffs.rs:168-191).
Because child polygons are contained in parents, one flattened pass
against ALL regions is equivalent (proof in SURVEY.md §4.3 #7); we
implement the flattened one-pass join (scale path) and a literal
cascade (test oracle) and assert they agree.

Existential membership (reference P4/P5):
  way ∈ poly      ⇔ ∃ member point ∈ poly         (left semi join)
  relation ∈ poly ⇔ ∃ member ∈ poly, recursively  (iterative semi join)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import BUFFER_DECIMICRO, MultiPolygon
from ..functions.coords import DEFAULT_RES
from .spatial_join import assign_regions


def effective_changes(changes: DataFrame, base: DataFrame) -> DataFrame:
    """One row per changed element with its effective coordinates:
    new coords when the change carries them, else the old base coords
    (deletes reference stored geometry,
    /root/reference/src/osmxml/filter.rs:250-254). Last writer wins
    within a batch (window by seq — the reference's in-order overwrite)."""
    w = Window.partitionBy("image_id").orderBy(F.desc("seq"))
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    old = base.select("image_id", F.col("lat").alias("_old_lat"), F.col("lon").alias("_old_lon"))
    return (
        last.join(old, "image_id", "left")
        .withColumn("eff_lat", F.coalesce(F.col("new_lat").cast("long"), F.col("_old_lat").cast("long")))
        .withColumn("eff_lon", F.coalesce(F.col("new_lon").cast("long"), F.col("_old_lon").cast("long")))
        .drop("_old_lat", "_old_lon")
        .filter(F.col("eff_lat").isNotNull())
    )


def classify_diff(
    changes: DataFrame,
    base: DataFrame,
    regions: list[MultiPolygon],
    res: int = DEFAULT_RES,
    buffer: int = BUFFER_DECIMICRO,
) -> DataFrame:
    """Flattened one-pass classification of a diff batch against every
    region. Returns (image_id, action, region_id, out_action); dropped
    (element, region) pairs are simply absent."""
    eff = effective_changes(changes, base)
    assigned = assign_regions(
        eff,
        regions,
        lon_col="eff_lon",
        lat_col="eff_lat",
        res=res,
        buffer=buffer,
        keep_cols=["image_id", "action"],
    )
    return assigned.select(
        "image_id",
        "action",
        "region_id",
        F.when(F.col("in_poly"), F.col("action")).otherwise(F.lit("delete")).alias(
            "out_action"
        ),
    )


def cascade_classify(
    changes: DataFrame,
    base: DataFrame,
    regions: list[MultiPolygon],
    res: int = DEFAULT_RES,
    buffer: int = BUFFER_DECIMICRO,
) -> DataFrame:
    """Literal re-expression of the reference's recursive fan-out
    (/root/reference/src/diffs.rs:168-191): each child filters its
    PARENT'S output rows (with the parent's possibly-overridden action).
    Used as the semantics oracle for :func:`classify_diff`."""
    eff = effective_changes(changes, base).select(
        "image_id", "action", "eff_lat", "eff_lon"
    )
    by_id = {mp.region_id: mp for mp in regions}
    children: dict[str | None, list[MultiPolygon]] = {}
    for mp in regions:
        children.setdefault(mp.parent_id, []).append(mp)

    outputs: list[DataFrame] = []

    def run(region: MultiPolygon, incoming: DataFrame) -> None:
        assigned = assign_regions(
            incoming,
            [region],
            lon_col="eff_lon",
            lat_col="eff_lat",
            res=res,
            buffer=buffer,
            keep_cols=["image_id", "action", "eff_lat", "eff_lon"],
        )
        mine = assigned.select(
            "image_id",
            "eff_lat",
            "eff_lon",
            F.when(F.col("in_poly"), F.col("action"))
            .otherwise(F.lit("delete"))
            .alias("action"),
        ).persist()
        outputs.append(
            mine.select(
                "image_id",
                F.col("action").alias("out_action"),
                F.lit(region.region_id).alias("region_id"),
            )
        )
        for ch in children.get(region.region_id, []):
            run(ch, mine)

    for root in children.get(None, []):
        run(root, eff)

    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# existential group membership (P4/P5)
# ---------------------------------------------------------------------------

def groups_in_regions(
    groups: DataFrame,
    member_regions: DataFrame,
    max_iters: int = 5,
) -> DataFrame:
    """(group_id, region_id) for every group with ≥1 member in the region.

    ``member_regions`` is (image_id, region_id) — the in-polygon point
    assignments. Ways resolve directly (semi join); relations iterate to
    a bounded fixpoint over group→group edges; cycles stop contributing
    (reference guard /root/reference/src/osmxml/filter.rs:159-169).
    Missing members contribute nothing."""
    edges = groups.select(
        "group_id", "kind", F.explode("members").alias("m")
    ).select("group_id", "kind", F.col("m.ref").alias("ref"), F.col("m.type").alias("ref_type"))

    pt = member_regions.select(F.col("image_id").alias("ref"), "region_id")

    resolved = (
        edges.filter(F.col("ref_type") == "image")
        .join(pt, "ref", "inner")
        .select("group_id", "region_id")
        .distinct()
        .persist()
    )
    group_edges = edges.filter(F.col("ref_type") == "group").select(
        "group_id", F.col("ref").alias("child_id")
    ).persist()

    for _ in range(max_iters):
        via_children = (
            group_edges.join(
                resolved.select(F.col("group_id").alias("child_id"), "region_id"),
                "child_id",
                "inner",
            )
            .select("group_id", "region_id")
            .distinct()
        )
        new_resolved = resolved.unionByName(via_children).distinct().persist()
        if new_resolved.count() == resolved.count():
            break
        resolved = new_resolved
    else:
        resolved = new_resolved
    return resolved
