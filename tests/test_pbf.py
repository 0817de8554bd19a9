"""PBF bulk import (SURVEY.md S3): from-scratch wire decode, distributed
scan, and the full-parity pipeline — the reference's own .osm.pbf store
plus its .osc diff must reproduce its golden bbox-annotated output
EXACTLY (every <bbox> in saint_barthelemy.bbox.osc.gz, including the
store-resolved delete-section composites).

Reference: /root/reference/src/osmpbf.rs (projection: node coords, way
refs, full relations); golden pipeline osmbin-import + bbox pass."""

import os

import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.sources.pbf import (
    parse_pbf_blob,
    read_pbf_elements,
    scan_pbf_blobs,
)

REF = "/root/reference/tests/resources"
PBF = f"{REF}/saint_barthelemy.osm.pbf"
SRC = f"{REF}/saint_barthelemy.osc.gz"
GOLD = f"{REF}/saint_barthelemy.bbox.osc.gz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PBF), reason="reference fixtures not available"
)


def _driver_rows():
    rows = []
    for b in scan_pbf_blobs(PBF):
        if b["type"] == "OSMData":
            rows.extend(parse_pbf_blob(PBF, b["offset"], b["size"]))
    return rows


def test_pbf_parse_golden_counts_and_values():
    """Wire-decode golden facts of the reference fixture: element
    counts, a way's exact ref chain (cross-checked against the same
    way's <nd> list in the .osc), a relation's typed members + roles +
    tags, and decimicro node coords."""
    rows = _driver_rows()
    kinds = {}
    for r in rows:
        kinds[r["kind"]] = kinds.get(r["kind"], 0) + 1
    assert kinds == {"node": 8076, "way": 625, "relation": 16}

    ways = {r["element_id"]: r for r in rows if r["kind"] == "way"}
    assert ways[24552609]["refs"] == [
        266964195, 266964211, 266964212, 266964213, 266964214, 266964215,
        266964216, 266964217, 266964218, 266964219, 266964220, 266060701,
        266964195,
    ]  # == the <nd> chain of the same way in saint_barthelemy.osc.gz

    rels = {r["element_id"]: r for r in rows if r["kind"] == "relation"}
    r = rels[529891]
    assert r["members"] == [
        {"ref": 670634766, "type": "node", "role": ""},
        {"ref": 670634768, "type": "node", "role": ""},
    ]
    tags = {t["k"]: t["v"] for t in r["tags"]}  # ordered (k,v) list
    assert tags["name"] == "Saint-Barthélemy III"
    assert tags["type"] == "site"

    nodes = {r["element_id"]: r for r in rows if r["kind"] == "node"}
    assert (nodes[266964195]["lat"], nodes[266964195]["lon"]) == (
        179044482,
        -628460020,
    )


def test_pbf_distributed_scan_matches_driver(spark):
    """The mapInPandas blob-range scan returns exactly the driver-side
    parse (same multiset of elements, all blobs covered)."""
    el = read_pbf_elements(spark, PBF)
    cnt = {r["kind"]: r["count"] for r in el.groupBy("kind").count().collect()}
    assert cnt == {"node": 8076, "way": 625, "relation": 16}
    s = el.filter(F.col("kind") == "node").agg(
        F.sum("element_id"), F.sum("lat"), F.sum("lon")
    ).collect()[0]
    rows = _driver_rows()
    want = (
        sum(r["element_id"] for r in rows if r["kind"] == "node"),
        sum(r["lat"] for r in rows if r["kind"] == "node"),
        sum(r["lon"] for r in rows if r["kind"] == "node"),
    )
    assert tuple(s) == want


def test_pbf_store_reproduces_golden_bbox_file(spark):
    """FULL pipeline parity with the reference: import the .osm.pbf as
    the store, parse the .osc diff, run the staged bbox annotation —
    the result must equal EVERY <bbox> in the reference's own
    bbox-annotated golden file, decimicro-exact. This is the
    store-resolved case the mock-store test cannot cover (delete-section
    ways/relations whose geometry lives only in the store)."""
    import pandas as pd

    from osm_replication_rust_spark.operators.bbox import annotate_diff_bboxes
    from osm_replication_rust_spark.sources.osc import (
        elements_df,
        parse_osc_elements,
    )
    from osm_replication_rust_spark.sources.pbf import pbf_to_engine

    base, groups = pbf_to_engine(spark, PBF)
    with open(SRC, "rb") as f:
        rows = parse_osc_elements(f.read(), state=1)
    elements = elements_df(spark, rows)
    out = annotate_diff_bboxes(
        elements, base, stored_groups=groups, namespace_ids=True
    )
    got = {
        r.element_id: (r.minlat, r.maxlat, r.minlon, r.maxlon)
        for r in out.collect()
    }

    with open(GOLD, "rb") as f:
        gold_rows = parse_osc_elements(f.read(), state=1)
    gold = {
        ("n" if r["kind"] == "node" else "w" if r["kind"] == "way" else "r")
        + r["element_id"]: r["bbox"]
        for r in gold_rows
        if r["bbox"] is not None
    }
    assert len(gold) == 12
    for gid, bb in gold.items():
        assert got.get(gid) == (
            bb["minlat"],
            bb["maxlat"],
            bb["minlon"],
            bb["maxlon"],
        ), gid
    # the geometry-less 2-cycle relations are the only golden elements
    # without a bbox, and must be absent here too
    assert "r7801" not in got and "r7802" not in got


def test_pbf_writer_reader_roundtrip(tmp_path):
    """Fixture writer -> reader identity: dense nodes (delta+zigzag
    varints over multiple zlib blobs), ways, typed relation members."""
    from osm_replication_rust_spark.sources.pbf import write_pbf

    nodes = [
        (
            i * 3 + 1,
            (i * 9871) % 1_800_000_000 - 900_000_000,
            (i * 31337) % 3_600_000_000 - 1_800_000_000,
        )
        for i in range(20000)
    ]
    ways = [(7, [1, 4, 10]), (9, [4, 1])]
    rels = [(5, [(1, "node", "admin_centre"), (7, "way", "outer"), (6, "relation", "sub")])]
    p = str(tmp_path / "rt.osm.pbf")
    write_pbf(p, nodes, ways, rels, nodes_per_blob=6000)
    rows = []
    for b in scan_pbf_blobs(p):
        if b["type"] == "OSMData":
            rows.extend(parse_pbf_blob(p, b["offset"], b["size"]))
    assert [(r["element_id"], r["lat"], r["lon"]) for r in rows if r["kind"] == "node"] == nodes
    assert [(r["element_id"], r["refs"]) for r in rows if r["kind"] == "way"] == ways
    assert [
        (r["element_id"], [(m["ref"], m["type"], m["role"]) for m in r["members"]])
        for r in rows
        if r["kind"] == "relation"
    ] == rels


def test_store_update_golden_reads(spark):
    """The reference's osmbin read_node test, re-expressed: import the
    .osm.pbf, apply way-666412102.osm.gz (a plain-<osm> update file) as
    a merge batch, then read back the EXACT golden values pinned in
    /root/reference/src/osmbin.rs:816-877 — pre-existing nodes, nodes
    created by the update, absent neighbors, and the updated way's ref
    chain."""
    import pandas as pd

    from osm_replication_rust_spark.operators.merge import merge_changes
    from osm_replication_rust_spark.sources.osc import (
        elements_df,
        elements_to_engine,
        parse_osc_elements,
    )
    from osm_replication_rust_spark.sources.pbf import pbf_to_engine

    base, groups = pbf_to_engine(spark, PBF)
    with open(f"{REF}/way-666412102.osm.gz", "rb") as f:
        rows = parse_osc_elements(f.read(), state=1)
    assert all(r["action"] == "modify" for r in rows)  # bare <osm> elements
    elements = elements_df(spark, rows)
    points, gch = elements_to_engine(elements, namespace_ids=True)

    new_base = merge_changes(base, points, key="image_id")
    want = {
        # pbf-imported nodes (osmbin.rs:835-856)
        "n266053077": (179031745, -628363074),
        "n2619283352": (179005419, -628327042),
        # nodes created by the update file (osmbin.rs:866-876)
        "n120470298": (-479975933, -742525578),
        "n6239222548": (-480692340, -742305121),
        "n6239224513": (-480231575, -742551240),
    }
    got = {
        r.image_id: (r.lat, r.lon)
        for r in new_base.filter(
            F.col("image_id").isin(list(want) + ["n1", "n266053076", "n2619283353"])
        ).collect()
    }
    assert {k: got.get(k) for k in want} == want
    for absent in ("n1", "n266053076", "n2619283353"):  # osmbin.rs:858-864
        assert absent not in got

    g_changes = gch.withColumnRenamed("kind", "new_kind")
    new_groups = merge_changes(groups, g_changes, key="group_id")
    w = new_groups.filter(F.col("group_id") == "w666412102").collect()
    assert len(w) == 1
    refs = [m["ref"] for m in w[0].members]
    assert len(refs) == 1060  # osmbin.rs:929-931
    assert refs[:5] == [
        "n120470298", "n6239222783", "n6239222782", "n6239222781", "n6239222780",
    ]


def test_pbf_relation_golden_full():
    """Relation 2324452 exactly as the reference's osmbin read_relation
    test pins it (/root/reference/src/osmbin.rs:1167-1220): member
    order, typed refs, roles, and all eight tags."""
    rows = _driver_rows()
    rels = {r["element_id"]: r for r in rows if r["kind"] == "relation"}
    r = rels[2324452]
    assert r["members"] == [
        {"ref": 279149652, "type": "node", "role": "admin_centre"},
        {"ref": 174027472, "type": "way", "role": "outer"},
        {"ref": 53561037, "type": "way", "role": "outer"},
        {"ref": 53561045, "type": "way", "role": "outer"},
        {"ref": 53656098, "type": "way", "role": "outer"},
        {"ref": 174027473, "type": "way", "role": "outer"},
        {"ref": 174023902, "type": "way", "role": "outer"},
    ]
    assert {t["k"]: t["v"] for t in r["tags"]} == {
        "admin_level": "8",
        "boundary": "administrative",
        "local_name": "Statia",
        "name": "Sint Eustatius",
        "name:el": "Άγιος Ευστάθιος",
        "name:fr": "Saint-Eustache",
        "name:nl": "Sint Eustatius",
        "type": "boundary",
    }


def test_store_boundary_update_golden(spark):
    """The reference's osmbin boundary_update test
    (/root/reference/src/osmbin.rs:1232-1289), re-expressed: import the
    .osm.pbf, apply saint_barthelemy-boundary.osc.gz through the merge
    path, read back the pinned coords / way ref-counts / absences."""
    import pandas as pd

    from osm_replication_rust_spark.operators.merge import merge_changes
    from osm_replication_rust_spark.sources.osc import (
        elements_df,
        elements_to_engine,
        parse_osc_elements,
    )
    from osm_replication_rust_spark.sources.pbf import pbf_to_engine

    base, groups = pbf_to_engine(spark, PBF)

    # pre-update state (osmbin.rs:1239-1254)
    pre_pts = {
        r.image_id: r.lat
        for r in base.filter(
            F.col("image_id").isin("n2619283348", "n2619283351", "n2619283352", "n2619283355")
        ).collect()
    }
    assert "n2619283348" not in pre_pts
    assert pre_pts["n2619283351"] == 179070278
    assert pre_pts["n2619283352"] == 179005419
    pre_w = {
        r.group_id: len(r.members)
        for r in groups.filter(
            F.col("group_id").isin(*[f"w25531671{i}" for i in range(5, 9)], "w255316725", "w255316727")
        ).collect()
    }
    assert pre_w == {"w255316718": 5, "w255316725": 6}

    with open(f"{REF}/saint_barthelemy-boundary.osc.gz", "rb") as f:
        rows = parse_osc_elements(f.read(), state=1)
    elements = elements_df(spark, rows)
    points, gch = elements_to_engine(elements, namespace_ids=True)
    new_base = merge_changes(base, points, key="image_id")
    new_groups = merge_changes(
        groups, gch.withColumnRenamed("kind", "new_kind"), key="group_id"
    )

    # post-update (osmbin.rs:1264-1287)
    want_lat = {
        "n2619283348": 181085101,
        "n2619283351": 179070278,
        "n2619283352": 179005419,
        "n2619283354": 181153011,
        "n2619283356": 180159423,
        "n2619283357": 180159415,
    }
    probe = list(want_lat) + [f"n{i}" for i in range(2619283355, 2619283400, 11)]
    got = {
        r.image_id: r.lat
        for r in new_base.filter(F.col("image_id").isin(probe)).collect()
    }
    assert {k: got.get(k) for k in want_lat} == want_lat
    assert "n2619283355" not in got and "n2619283366" not in got

    want_w = {
        "w255316716": 3,
        "w255316718": 5,
        "w255316725": 6,
        "w255316727": 2,
        "w255316729": 4,
        "w255316730": 6,
    }
    probe_w = list(want_w) + ["w255316715", "w255316717", "w255316728", "w255316731"]
    got_w = {
        r.group_id: len(r.members)
        for r in new_groups.filter(F.col("group_id").isin(probe_w)).collect()
    }
    assert {k: got_w.get(k) for k in want_w} == want_w
    for absent in ("w255316715", "w255316717", "w255316728", "w255316731"):
        assert absent not in got_w
