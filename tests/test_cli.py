"""CLI end-to-end on the reference's own fixtures: import the .osm.pbf,
replay the boundary diff through `update`, read back the reference's
pinned osmbin values, run `check` and a single-region `filter` extract
(/root/reference/src/bin/{osmbin,update,osmxml}.rs surfaces)."""

import gzip
import os
import shutil

import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark import cli
from osm_replication_rust_spark.functions.coords import unpack_lat

REF = "/root/reference/tests/resources"
PBF = f"{REF}/saint_barthelemy.osm.pbf"


@pytest.fixture(scope="module")
def store_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clistore"))
    assert cli.main(["import", PBF, "--store", d]) == 0
    return d


def test_cli_import_and_read_node(spark, store_dir):
    st = cli._store(spark, store_dir)
    got = {
        r.image_id: r.lat
        for r in cli._base_points(st)
        .filter(F.col("image_id").isin("n2619283351", "n2619283352"))
        .collect()
    }
    # the reference's pre-update pins (/root/reference/src/osmbin.rs:1239-1254)
    assert got == {"n2619283351": 179070278, "n2619283352": 179005419}
    assert cli.main(["read", "node", "n2619283351", "--store", store_dir]) == 0


def test_cli_read_way_full(spark, store_dir, capsys):
    assert cli.main(["read", "way_full", "w255316725", "--store", store_dir]) == 0
    out = capsys.readouterr().out
    assert "1 row(s)" in out and "coords" in out


def test_cli_check_runs(spark, store_dir):
    # the extract references elements outside its cut: check must run
    # and report (exit 1 = dangling found, 0 = clean — both are valid
    # outcomes of a *working* checker on a regional extract)
    rc = cli.main(["check", "--store", store_dir, "--limit", "3"])
    assert rc in (0, 1)


def test_cli_update_applies_boundary_diff(spark, store_dir, tmp_path):
    # replication tree: state 1 at minute/000/000/001.osc.gz
    diffs = tmp_path / "minute" / "000" / "000"
    diffs.mkdir(parents=True)
    shutil.copy(f"{REF}/saint_barthelemy-boundary.osc.gz", diffs / "001.osc.gz")
    polys = tmp_path / "polys"
    polys.mkdir()
    shutil.copy(f"{REF}/saint_barthelemy.poly", polys / "saint_barthelemy.poly")
    out = str(tmp_path / "out")

    rc = cli.main([
        "update",
        "--store", store_dir,
        "--polygons", str(polys),
        "--diffs", str(tmp_path / "minute"),
        "--out", out,
    ])
    assert rc == 0
    st = cli._store(spark, store_dir)
    assert st.last_state() == 1
    # post-update pins (/root/reference/src/osmbin.rs:1264-1287) through
    # the CLI path: created node present, deleted node gone
    cur = st.current().select("image_id", unpack_lat(F.col("phash")).alias("lat"))
    got = {
        r.image_id: r.lat
        for r in cur.filter(
            F.col("image_id").isin("n2619283348", "n2619283355", "n2619283354")
        ).collect()
    }
    assert got.get("n2619283348") == 181085101
    assert got.get("n2619283354") == 181153011
    assert "n2619283355" not in got
    # group store merged too (way counts from the same reference test)
    groups = cli._read_groups(spark, store_dir)
    got_w = {
        r.group_id: len(r.members)
        for r in groups.filter(
            F.col("group_id").isin("w255316716", "w255316730", "w255316715")
        ).collect()
    }
    assert got_w.get("w255316716") == 3
    assert got_w.get("w255316730") == 6
    assert "w255316715" not in got_w
    # artifacts published
    assert os.path.isdir(os.path.join(out, "tiles/state=1"))
    assert os.path.exists(os.path.join(out, "metrics/state=1.json"))


def test_cli_filter_extract(spark, store_dir, tmp_path):
    out = str(tmp_path / "extract.osc")
    rc = cli.main([
        "filter",
        f"{REF}/saint_barthelemy.osc.gz",
        out,
        "--poly", f"{REF}/saint_barthelemy.poly",
        "--store", store_dir,
    ])
    assert rc == 0
    from osm_replication_rust_spark.sources.osc import parse_osc_elements

    with open(out, "rb") as f:
        rows = parse_osc_elements(f.read(), state=0)
    assert len(rows) > 0
    kinds = {r["kind"] for r in rows}
    assert "node" in kinds


def test_cli_update_publishes_region_osc_tree(spark, tmp_path):
    """`update --osc-tree` publishes the reference's per-region .osc.gz
    interchange tree (diffs.rs layout) from the same classification the
    tiles came from."""
    store = str(tmp_path / "store")
    assert cli.main(["import", PBF, "--store", store]) == 0
    diffs = tmp_path / "minute" / "000" / "000"
    diffs.mkdir(parents=True)
    shutil.copy(f"{REF}/saint_barthelemy.osc.gz", diffs / "002.osc.gz")
    polys = tmp_path / "polys"
    polys.mkdir()
    shutil.copy(f"{REF}/saint_barthelemy.poly", polys / "saint_barthelemy.poly")
    tree = str(tmp_path / "tree")
    rc = cli.main([
        "update",
        "--store", store,
        "--polygons", str(polys),
        "--diffs", str(tmp_path / "minute"),
        "--out", str(tmp_path / "out"),
        "--osc-tree", tree,
    ])
    assert rc == 0
    leaf = os.path.join(tree, "saint_barthelemy", "minute", "000", "000", "002.osc.gz")
    assert os.path.exists(leaf)
    from osm_replication_rust_spark.sources.osc import parse_osc_elements

    with open(leaf, "rb") as f:
        rows = parse_osc_elements(f.read(), state=2)
    assert len(rows) > 0
    # current-state pointer
    link = os.path.join(tree, "saint_barthelemy", "minute", "state.txt")
    assert os.path.exists(link)


def test_cli_update_follow_streaming(spark, tmp_path):
    """`update --follow`: checkpointed file-stream processing — a second
    CLI invocation resumes from the stream checkpoint and processes
    ONLY the newly-landed diff file."""
    store = str(tmp_path / "store")
    assert cli.main(["import", PBF, "--store", store]) == 0
    diffs = tmp_path / "minute" / "000" / "000"
    diffs.mkdir(parents=True)
    polys = tmp_path / "polys"
    polys.mkdir()
    shutil.copy(f"{REF}/saint_barthelemy.poly", polys / "saint_barthelemy.poly")
    argv = [
        "update", "--follow",
        "--store", store,
        "--polygons", str(polys),
        "--diffs", str(tmp_path / "minute"),
        "--out", str(tmp_path / "out"),
    ]
    shutil.copy(f"{REF}/saint_barthelemy-boundary.osc.gz", diffs / "001.osc.gz")
    assert cli.main(argv) == 0
    st = cli._store(spark, store)
    assert st.last_state() == 1
    # second file lands; restart resumes from the checkpoint
    shutil.copy(f"{REF}/saint_barthelemy.osc.gz", diffs / "002.osc.gz")
    assert cli.main(argv) == 0
    assert cli._store(spark, store).last_state() == 2
    # both states' artifacts exist; state 1 applied once (v1 snapshot dir)
    assert os.path.isdir(os.path.join(store, "points", "v1"))
    assert os.path.isdir(os.path.join(store, "points", "v2"))
