"""Staged bbox aggregation tests — the reference's bbox-pass semantics
(/root/reference/src/osmxml/bbox.rs): old∪new union, way and relation
aggregation, the 2-cycle relation pair, missing refs tolerated."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.operators.bbox import group_bboxes, point_bboxes

M = 1_000_000


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["i1", "i2", "i3", "i4"],
                "lat": [0, 10 * M, -5 * M, 7 * M],
                "lon": [0, 10 * M, 5 * M, -7 * M],
            }
        )
    )


@pytest.fixture(scope="module")
def changes(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["i1", "i2", "i9"],
                "action": ["modify", "delete", "create"],
                "seq": [0, 1, 2],
                "new_lat": [2 * M, None, 3 * M],
                "new_lon": [2 * M, None, 3 * M],
            }
        )
    )


def test_point_bboxes_old_union_new(spark, base, changes):
    got = {
        r.image_id: (r.minlat, r.maxlat, r.minlon, r.maxlon)
        for r in point_bboxes(base, changes).collect()
    }
    # modify: old (0,0) ∪ new (2M,2M)
    assert got["i1"] == (0, 2 * M, 0, 2 * M)
    # delete: old coords only
    assert got["i2"] == (10 * M, 10 * M, 10 * M, 10 * M)
    # create: new coords only (no base row — tolerated)
    assert got["i9"] == (3 * M, 3 * M, 3 * M, 3 * M)
    assert set(got) == {"i1", "i2", "i9"}  # untouched i3/i4 absent


def test_group_bboxes(spark, base, changes):
    groups = spark.createDataFrame(
        [
            # way over i1 (changed) and i3 (unchanged -> not in point_bboxes,
            # so it contributes nothing: the bbox pass only sees changed pts)
            ("w1", "way", [{"ref": "i1", "type": "image", "role": ""}]),
            ("w2", "way", [
                {"ref": "i2", "type": "image", "role": ""},
                {"ref": "i9", "type": "image", "role": ""},
            ]),
            # relation over w2 + a point
            ("r1", "relation", [
                {"ref": "w2", "type": "group", "role": "outer"},
                {"ref": "i1", "type": "image", "role": "centre"},
            ]),
            # relation -> relation chain
            ("r2", "relation", [{"ref": "r1", "type": "group", "role": "sub"}]),
            # 2-cycle (reference /root/reference/src/osmxml/bbox.rs:222-246)
            ("c1", "relation", [
                {"ref": "c2", "type": "group", "role": "loop"},
                {"ref": "i9", "type": "image", "role": ""},
            ]),
            ("c2", "relation", [{"ref": "c1", "type": "group", "role": "loop"}]),
            # all members missing -> no bbox row at all
            ("w9", "way", [{"ref": "nope", "type": "image", "role": ""}]),
        ],
        "group_id string, kind string, members array<struct<ref:string,type:string,role:string>>",
    )
    pb = point_bboxes(base, changes)
    got = {
        r.group_id: (r.minlat, r.maxlat, r.minlon, r.maxlon)
        for r in group_bboxes(groups, pb).collect()
    }
    assert got["w1"] == (0, 2 * M, 0, 2 * M)
    # w2 = i2 (10M,10M) ∪ i9 (3M,3M)
    assert got["w2"] == (3 * M, 10 * M, 3 * M, 10 * M)
    # r1 = w2 ∪ i1
    assert got["r1"] == (0, 10 * M, 0, 10 * M)
    # r2 = r1 via relation->relation resolution
    assert got["r2"] == got["r1"]
    # cycle: c1 gets i9; c2 gets c1's bbox; fixpoint stops growing
    assert got["c1"] == (3 * M, 3 * M, 3 * M, 3 * M)
    assert got["c2"] == got["c1"]
    assert "w9" not in got


def test_bbox_equals_sql_oracle(spark, base, changes):
    """The staged point bbox is expressible as SQL — cross-check with an
    independent spark.sql formulation."""
    base.createOrReplaceTempView("b")
    changes.createOrReplaceTempView("c")
    want = {
        r.image_id: (r.minlat, r.maxlat, r.minlon, r.maxlon)
        for r in spark.sql(
            """
            WITH pts AS (
              SELECT image_id, lat, lon FROM b
              WHERE image_id IN (SELECT image_id FROM c)
              UNION ALL
              SELECT image_id, new_lat, new_lon FROM c WHERE new_lat IS NOT NULL
            )
            SELECT image_id, min(lat) minlat, max(lat) maxlat,
                   min(lon) minlon, max(lon) maxlon
            FROM pts GROUP BY image_id
            """
        ).collect()
    }
    got = {
        r.image_id: (r.minlat, r.maxlat, r.minlon, r.maxlon)
        for r in point_bboxes(base, changes).collect()
    }
    assert got == want
