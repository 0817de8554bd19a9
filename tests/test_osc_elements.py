"""Three-kind OsmChange XML: parse / write round-trip, golden counts on
the reference's own test fixture (saint_barthelemy.osc.gz — the same
file the reference's bbox/filter tests drive,
/root/reference/src/osmxml/bbox.rs:260-272), set-based bbox annotation
vs the golden bbox-annotated file, and the full parsed diff fed through
the classifier for all three kinds at once."""

import gzip
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.sources.osc import (
    elements_df,
    elements_to_engine,
    format_osc_elements,
    parse_osc_elements,
    read_osc_elements_dir,
)

REF = "/root/reference/tests/resources"
SRC = f"{REF}/saint_barthelemy.osc.gz"
GOLD = f"{REF}/saint_barthelemy.bbox.osc.gz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SRC), reason="reference fixtures not available"
)


def _rows(path):
    with open(path, "rb") as f:
        return parse_osc_elements(f.read(), state=1)


def test_parse_reference_fixture_golden_counts():
    """Golden per-kind/per-action counts over the reference's own diff
    fixture (the set-based analog of bbox.rs:269-271's probe counts):
    the file carries 5 nodes, 4 ways, 5 relations."""
    rows = _rows(SRC)
    by = {}
    for r in rows:
        by[(r["action"], r["kind"])] = by.get((r["action"], r["kind"]), 0) + 1
    assert by == {
        ("delete", "node"): 3,
        ("delete", "way"): 3,
        ("delete", "relation"): 2,
        ("create", "node"): 2,
        ("create", "way"): 1,
        ("create", "relation"): 3,
    }
    w = {r["element_id"]: r for r in rows if r["kind"] == "way"}
    assert len(w["24552609"]["members"]) == 13  # nd refs, order preserved
    assert w["24552609"]["members"][0]["ref"] == "266964195"
    r7800 = next(r for r in rows if r["element_id"] == "7800")
    assert [m["type"] for m in r7800["members"]] == ["node", "node", "way"]
    assert r7800["members"][2]["role"] == "outer"
    # document order == seq order, nodes/ways/relations interleaved
    assert [r["seq"] for r in rows] == list(range(14))


def test_element_roundtrip_with_bbox():
    """parse -> format -> parse is the identity on the golden
    bbox-annotated fixture (members, tags, coords, bbox children)."""
    rows = _rows(GOLD)
    assert any(r["bbox"] is not None for r in rows)
    again = parse_osc_elements(format_osc_elements(rows).encode(), state=1)
    assert again == rows


def test_bbox_annotation_matches_golden_for_diff_resolvable(spark):
    """Set-based bbox annotation vs the reference's golden file, under
    the reference test's own store (MockReader: empty except the
    7801⇄7802 relation cycle, bbox.rs:205-247): every element whose
    geometry resolves from the diff itself must carry EXACTLY the
    golden bbox; store-resolved elements are absent (the mock store has
    no geometry), and the pure cycle resolves to nothing."""
    from osm_replication_rust_spark.operators.bbox import annotate_diff_bboxes

    rows = _rows(SRC)
    gold = {
        r["element_id"]: r["bbox"] for r in _rows(GOLD) if r["bbox"] is not None
    }
    elements = elements_df(spark, rows)
    base = spark.createDataFrame([], "image_id string, lat long, lon long")
    cycle = spark.createDataFrame(
        [
            ("7801", "relation", [{"ref": "7802", "type": "group", "role": "subarea"}]),
            ("7802", "relation", [{"ref": "7801", "type": "group", "role": "subarea"}]),
        ],
        "group_id string, kind string, "
        "members array<struct<ref:string,type:string,role:string>>",
    )
    got = {
        r.element_id: (r.kind, r.minlat, r.maxlat, r.minlon, r.maxlon)
        for r in annotate_diff_bboxes(elements, base, stored_groups=cycle).collect()
    }
    # all five nodes carry coords -> bbox == own coord == golden
    for nid in ("1759873129", "1759883953", "1973325505", "78", "79"):
        g = gold[nid]
        assert got[nid] == ("node", g["minlat"], g["maxlat"], g["minlon"], g["maxlon"])
    # way 780 and relation 7800 resolve fully from in-diff nodes
    for gid, kind in (("780", "way"), ("7800", "relation")):
        g = gold[gid]
        assert got[gid] == (kind, g["minlat"], g["maxlat"], g["minlon"], g["maxlon"])
    # delete-section composites reference only store geometry the mock
    # doesn't have -> no bbox row (reference emits no <bbox> then)
    for absent in ("24552609", "24552626", "24552826", "529891", "1106302"):
        assert absent not in got
    # the 2-cycle contributes no geometry and must not loop forever
    assert "7801" not in got and "7802" not in got


def test_read_osc_elements_dir_distributed(spark, tmp_path):
    """binaryFile -> mapInPandas scan returns the same rows as the
    driver-side parse, with state recovered from the sharded path."""
    import shutil

    d = tmp_path / "000" / "000"
    d.mkdir(parents=True)
    shutil.copy(SRC, d / "001.osc.gz")
    shutil.copy(GOLD, d / "002.osc.gz")
    df = read_osc_elements_dir(spark, str(tmp_path))
    got = df.groupBy("state", "kind").count().collect()
    cnt = {(r.state, r.kind): r["count"] for r in got}
    assert cnt[(1, "node")] == 5 and cnt[(1, "way")] == 4 and cnt[(1, "relation")] == 5
    assert cnt[(2, "node")] == 5 and cnt[(2, "way")] == 4 and cnt[(2, "relation")] == 5
    # bbox children survive the distributed parse
    n_bbox = df.filter(F.col("bbox").isNotNull()).count()
    assert n_bbox == 12  # every golden element but the geometry-less 2-cycle


def test_three_kind_diff_through_classifier(spark):
    """One parsed XML diff drives BOTH classifiers (points + composites)
    — reference-style golden counts across all three element kinds
    (filter.rs:390-392 counts probes per kind; we pin the classified
    row counts, which are pure data facts of fixture × polygon)."""
    from osm_replication_rust_spark.operators.filter import (
        classify_diff,
        classify_group_diff,
    )
    from osm_replication_rust_spark.sources.poly import parse_poly

    with open(f"{REF}/saint_barthelemy.poly") as f:
        region = parse_poly(f.read(), "saint_barthelemy")

    rows = _rows(SRC)
    elements = elements_df(spark, rows)
    points, gch = elements_to_engine(elements)
    # store for member resolution: the diff's own node coordinates
    # (the reference's nodes_seen maps resolve diff-internal refs)
    base = points.filter(F.col("new_lat").isNotNull()).select(
        "image_id", F.col("new_lat").alias("lat"), F.col("new_lon").alias("lon")
    )
    pt_out = classify_diff(points, base, [region]).collect()
    grp_out = classify_group_diff(
        gch.select("group_id", "action", "kind", "new_members"),
        spark.createDataFrame(
            [],
            "group_id string, kind string, "
            "members array<struct<ref:string,type:string,role:string>>",
        ),
        base,
        [region],
    ).collect()
    got_pts = {(r.image_id, r.out_action) for r in pt_out}
    got_grp = {(r.group_id, r.kind, r.out_action) for r in grp_out}
    # golden (fixture × polygon facts): the three deleted nodes sit
    # INSIDE Saint-Barthélemy -> kept with their original action;
    # creates 78/79 sit ~0.2° outside the buffered polygon -> dropped;
    # way 780 / relation 7800 reference only those outside nodes ->
    # dropped; the delete-section composites reference store-only
    # geometry the empty store lacks -> dropped (same as the
    # reference's MockReader run); 7801/7802 have no geometry at all.
    assert got_pts == {
        ("1759873129", "delete"),
        ("1759883953", "delete"),
        ("1973325505", "delete"),
    }
    assert got_grp == set()


def test_metadata_survives_roundtrip_on_reference_fixture():
    """version/timestamp/uid/user/changeset (osm.rs:16-35, parsed at
    osmxml.rs:131-166, re-emitted at 789-812) survive
    parse -> format -> parse on the reference's own fixture, and the
    parsed values match the file's literal attributes."""
    rows = _rows(SRC)
    n = next(r for r in rows if r["element_id"] == "1759873129")
    assert (n["version"], n["uid"], n["changeset"]) == (3, 1811738, 19926891)
    assert n["timestamp"] == "2014-01-10T23:00:23Z"
    assert n["user"] == "47NOE"
    w = next(r for r in rows if r["element_id"] == "24552609")
    assert (w["version"], w["user"]) == (1, "encleadus")
    # every element in the fixture carries all five attributes
    for r in rows:
        for a in ("version", "timestamp", "uid", "user", "changeset"):
            assert r[a] is not None, (r["element_id"], a)
    again = parse_osc_elements(format_osc_elements(rows).encode(), state=1)
    assert again == rows


def test_ordered_duplicate_key_tags_roundtrip():
    """Tags are Vec<(String,String)> in the reference (osm.rs:50-53):
    order-preserving, duplicate keys legal. A hostile-but-legal tag
    list must survive the writer/parser byte dance verbatim."""
    hostile = [
        {
            "state": 1, "seq": 0, "action": "modify", "kind": "node",
            "element_id": "1", "new_lat": 10, "new_lon": 20,
            "version": 2, "timestamp": "2020-01-01T00:00:00Z",
            "uid": None, "user": 'quo"te & <angle>', "changeset": 9,
            "tags": [
                {"k": "name", "v": "second"},
                {"k": "zzz", "v": "x"},
                {"k": "name", "v": "first"},
                {"k": "name", "v": "second"},
            ],
            "members": None, "bbox": None,
        }
    ]
    back = parse_osc_elements(format_osc_elements(hostile).encode(), state=1)
    assert back == hostile
    assert [t["v"] for t in back[0]["tags"]] == ["second", "x", "first", "second"]


def test_tag_views_and_bare_session_frame(spark):
    """tag_value/tags_to_map give map-like lookups over the ordered
    list (first occurrence wins), and elements_df builds the frame
    without pandas so nullable-int metadata stays LongType."""
    from osm_replication_rust_spark.sources.osc import tag_value, tags_to_map

    rows = [
        {
            "state": 1, "seq": 0, "action": "create", "kind": "node",
            "element_id": "n1", "new_lat": 5, "new_lon": 6,
            "version": 7, "timestamp": None, "uid": None, "user": None,
            "changeset": None,
            "tags": [
                {"k": "caption", "v": "one"},
                {"k": "caption", "v": "two"},
                {"k": "phash", "v": "42"},
            ],
            "members": None, "bbox": None,
        },
        {
            "state": 1, "seq": 1, "action": "create", "kind": "node",
            "element_id": "n2", "new_lat": None, "new_lon": None,
            "version": None, "timestamp": None, "uid": None, "user": None,
            "changeset": None, "tags": None, "members": None, "bbox": None,
        },
    ]
    df = elements_df(spark, rows)
    assert dict(df.dtypes)["version"] == "bigint"
    got = df.select(
        "element_id",
        tag_value("tags", "caption").alias("cap"),
        tag_value("tags", "phash").cast("long").alias("ph"),
        tags_to_map("tags").alias("m"),
    ).collect()
    by = {r.element_id: r for r in got}
    assert by["n1"].cap == "one" and by["n1"].ph == 42
    assert by["n1"].m == {"caption": "one", "phash": "42"}
    assert by["n2"].cap is None and by["n2"].m is None


def test_distributed_region_tree_byte_parity(spark, tmp_path):
    """K5 interop: write_region_osc_tree publishes the reference's
    per-region interchange tree (<region>/minute/AAA/BBB/CCC.osc.gz +
    state.txt symlink, diffs.rs:94-166) from a DataFrame via
    applyInPandas, and every published file is BYTE-identical to a
    driver-side format_osc_elements of the same rows."""
    from osm_replication_rust_spark.sources.osc import (
        ELEMENT_SCHEMA,
        write_region_osc_tree,
    )

    base_rows = _rows(GOLD)  # carries tags, members, bbox, metadata
    regions = [
        "africa/spain/canarias/las_palmas",
        "africa/spain/canarias/santa_cruz_de_tenerife",
        "europe/france",
    ]
    states = [1, 1_000_002]
    cells = {}
    rows = []
    for ri, region in enumerate(regions):
        for state in states:
            # distinct per-cell subset so files must differ
            sel = [
                dict(r, state=state)
                for i, r in enumerate(base_rows)
                if i % (ri + 2) == 0
            ]
            cells[(region, state)] = sel
            rows.extend(dict(r, region=region) for r in sel)
    df = spark.createDataFrame(rows, schema=ELEMENT_SCHEMA + ", region string")

    root = str(tmp_path / "diffs")
    written = write_region_osc_tree(df, root)
    assert len(written) == len(cells)

    for w in written:
        expect = gzip.compress(
            format_osc_elements(cells[(w["region"], w["state"])]).encode(),
            mtime=0,
        )
        with open(w["path"], "rb") as f:
            assert f.read() == expect, (w["region"], w["state"])
        assert w["n_rows"] == len(cells[(w["region"], w["state"])])

    # layout: region hierarchy + 3/3/3 shard + state sidecars
    p = os.path.join(
        root, "africa/spain/canarias/las_palmas", "minute/001/000/002.osc.gz"
    )
    assert os.path.exists(p)
    st = os.path.join(
        root, "africa/spain/canarias/las_palmas", "minute/001/000/002.state.txt"
    )
    with open(st) as f:
        assert f.read() == "sequenceNumber=1000002\n"
    link = os.path.join(root, "africa/spain/canarias/las_palmas", "minute/state.txt")
    assert os.path.islink(link)
    with open(link) as f:  # resolves through the symlink to the newest
        assert f.read() == "sequenceNumber=1000002\n"

    # the published tree reads back distributedly with states recovered
    back = read_osc_elements_dir(spark, os.path.join(root, "europe/france"))
    got = {r["state"]: r["cnt"] for r in back.groupBy("state").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == {s: len(cells[("europe/france", s)]) for s in states}
