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
    assert r["tags"]["name"] == "Saint-Barthélemy III"
    assert r["tags"]["type"] == "site"

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
        ELEMENT_SCHEMA,
        parse_osc_elements,
    )
    from osm_replication_rust_spark.sources.pbf import pbf_to_engine

    base, groups = pbf_to_engine(spark, PBF)
    with open(SRC, "rb") as f:
        rows = parse_osc_elements(f.read(), state=1)
    elements = spark.createDataFrame(pd.DataFrame(rows), schema=ELEMENT_SCHEMA)
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
