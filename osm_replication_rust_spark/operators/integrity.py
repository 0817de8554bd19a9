"""Referential integrity check (reference J5:
/root/reference/src/osmbin.rs:251-363 `check_database`): every member
reference must exist. A left anti join per reference type; group→group
references are checked against the groups table itself.

Unlike the bbox/filter paths (where missing refs are tolerated), the
check reports them — the reference errors, we return the offending rows
so callers decide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dangling_refs(groups: DataFrame, images: DataFrame) -> DataFrame:
    """(group_id, ref, ref_type) rows whose target does not exist."""
    edges = groups.select("group_id", F.explode("members").alias("m")).select(
        "group_id", F.col("m.ref").alias("ref"), F.col("m.type").alias("ref_type")
    )
    img_ids = images.select(F.col("image_id").alias("ref"))
    grp_ids = groups.select(F.col("group_id").alias("ref"))
    bad_imgs = edges.filter(F.col("ref_type") == "image").join(img_ids, "ref", "left_anti")
    bad_grps = edges.filter(F.col("ref_type") == "group").join(grp_ids, "ref", "left_anti")
    return bad_imgs.unionByName(bad_grps)
