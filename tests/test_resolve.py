"""way_full / relation closure resolution (S9/S10)."""

import pandas as pd
import pytest

from osm_replication_rust_spark.operators.resolve import (
    resolve_relation_members,
    resolve_way_full,
)


@pytest.fixture(scope="module")
def world(spark):
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["p1", "p2", "p3", "p4"],
                "lat": [1, 2, 3, 4],
                "lon": [10, 20, 30, 40],
            }
        )
    )
    groups = spark.createDataFrame(
        [
            ("w1", "way", [
                {"ref": "p3", "type": "image", "role": ""},
                {"ref": "p1", "type": "image", "role": ""},
                {"ref": "p2", "type": "image", "role": ""},
            ]),
            ("w2", "way", [
                {"ref": "p4", "type": "image", "role": ""},
                {"ref": "missing", "type": "image", "role": ""},
            ]),
            ("r1", "relation", [
                {"ref": "w1", "type": "group", "role": "outer"},
                {"ref": "p4", "type": "image", "role": "centre"},
            ]),
            ("r2", "relation", [{"ref": "r1", "type": "group", "role": "sub"}]),
            ("c1", "relation", [
                {"ref": "c2", "type": "group", "role": ""},
                {"ref": "p1", "type": "image", "role": ""},
            ]),
            ("c2", "relation", [{"ref": "c1", "type": "group", "role": ""}]),
        ],
        "group_id string, kind string, members array<struct<ref:string,type:string,role:string>>",
    )
    return points, groups


def test_way_full_order_preserved(spark, world):
    points, groups = world
    got = {r.group_id: [(c[0], c[1]) for c in r.coords] for r in resolve_way_full(groups, points).collect()}
    # member order p3, p1, p2 preserved exactly
    assert got["w1"] == [(3, 30), (1, 10), (2, 20)]
    # missing ref contributes nothing
    assert got["w2"] == [(4, 40)]


def test_relation_closure(spark, world):
    points, groups = world
    got = {}
    for r in resolve_relation_members(groups, points).collect():
        got.setdefault(r.group_id, set()).add((r.member_id, r.depth))
    # r1: direct p4 (depth 1) + w1's points (depth 2)
    assert got["r1"] == {("p4", 1), ("p1", 2), ("p2", 2), ("p3", 2)}
    # r2 reaches everything via r1 one level deeper
    assert {m for m, _ in got["r2"]} == {"p4", "p1", "p2", "p3"}
    # cycle pair: c1 has p1 direct; c2 reaches p1 through c1; bounded
    assert {m for m, _ in got["c1"]} == {"p1"}
    assert {m for m, _ in got["c2"]} == {"p1"}
