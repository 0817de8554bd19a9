""".poly parser / region-dir scan / OsmChange XML source round-trips,
and the end-to-end file-driven pipeline (the reference's actual input
formats feeding the set-based engine)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.datagen.synth import fixture_regions, gen_diffs, gen_images
from osm_replication_rust_spark.sources.osc import (
    format_osc,
    parse_osc_bytes,
    read_osc_dir,
    state_from_path,
    write_osc_tree,
)
from osm_replication_rust_spark.sources.poly import (
    format_poly,
    parse_poly,
    regions_from_dir,
    write_region_dir,
)

AFRICA_POLY = """africa
1
   -13.0   27.0
   -13.0   5.0
   10.0   5.0
   33.0   27.5
   -13.0   27.0
END
!2
   0.0   10.0
   1.0   10.0
   1.0   11.0
   0.0   10.0
END
END
"""


def test_parse_poly():
    mp = parse_poly(AFRICA_POLY, "africa")
    assert len(mp.rings) == 2
    assert not mp.rings[0].hole and mp.rings[1].hole
    assert mp.rings[0].coords[0].tolist() == [-130_000_000, 270_000_000]
    assert mp.rings[0].coords[3].tolist() == [330_000_000, 275_000_000]


def test_poly_roundtrip():
    mp = parse_poly(AFRICA_POLY, "africa")
    again = parse_poly(format_poly(mp), "africa")
    assert len(again.rings) == len(mp.rings)
    for a, b in zip(again.rings, mp.rings):
        assert a.hole == b.hole
        assert (a.coords == b.coords).all()


def test_region_dir_roundtrip(tmp_path, regions):
    write_region_dir(regions, str(tmp_path))
    back = regions_from_dir(str(tmp_path))
    assert {m.region_id for m in back} == {m.region_id for m in regions}
    by_id = {m.region_id: m for m in back}
    for mp in regions:
        got = by_id[mp.region_id]
        assert got.parent_id == mp.parent_id
        assert len(got.rings) == len(mp.rings)
        for a, b in zip(got.rings, mp.rings):
            assert a.hole == b.hole
            assert (a.coords == b.coords).all()


def test_state_from_path():
    assert state_from_path("/x/001/002/003.osc.gz") == 1_002_003
    assert state_from_path("/x/42.osc") == 42


def test_osc_roundtrip():
    rows = [
        dict(state=7, seq=0, action="create", image_id="img1",
             new_lat=12_345_678, new_lon=-23_456_789, new_caption='a "quoted" <cap>', new_phash=99),
        dict(state=7, seq=1, action="create", image_id="img2",
             new_lat=1, new_lon=2, new_caption=None, new_phash=None),
        dict(state=7, seq=2, action="modify", image_id="img1",
             new_lat=5, new_lon=6, new_caption="x", new_phash=None),
        dict(state=7, seq=3, action="delete", image_id="img2",
             new_lat=None, new_lon=None, new_caption=None, new_phash=None),
    ]
    xml = format_osc(rows)
    assert xml.count("<create>") == 1 and xml.count("<modify>") == 1
    back = parse_osc_bytes(xml.encode(), 7)
    assert len(back) == 4
    assert back[0]["image_id"] == "img1" and back[0]["new_lat"] == 12_345_678
    assert back[0]["new_caption"] == 'a "quoted" <cap>'
    assert back[3]["action"] == "delete" and back[3]["new_lat"] is None


def test_read_osc_dir_and_pipeline(spark, regions, images_pdf, tmp_path):
    """File-driven end to end: diffs written as sharded .osc.gz, read
    back distributedly, driven through the update pipeline."""
    from osm_replication_rust_spark.operators.merge import TableStore
    from osm_replication_rust_spark.plans.pipeline import run_update

    diffs_pdf = gen_diffs(images_pdf.iloc[:200], n_batches=2)
    paths = write_osc_tree(diffs_pdf, str(tmp_path / "osc"))
    assert all(p.endswith(".osc.gz") for p in paths)

    changes = read_osc_dir(spark, str(tmp_path / "osc"))
    got = changes.orderBy("state", "seq").collect()
    want = diffs_pdf.sort_values(["state", "seq"])
    assert len(got) == len(want)
    assert [r.image_id for r in got] == list(want.image_id)
    assert [r.action for r in got] == list(want.action)
    # lat/lon survive the float-degree round trip exactly (decimicro)
    import pandas as pd

    w_lat = [None if pd.isna(v) else int(v) for v in want.new_lat]
    assert [r.new_lat for r in got] == w_lat

    store = TableStore(spark, str(tmp_path / "tbl"))
    store.init(spark.createDataFrame(images_pdf[["image_id", "caption", "phash"]].iloc[:200]))
    applied = run_update(store, changes, regions, str(tmp_path / "out"))
    assert applied == [1, 2]
    import json, os

    m1 = json.load(open(tmp_path / "out/metrics/state=1.json"))
    assert m1["tile_rows"] == m1["kept"] + m1["forced_delete"]
    assert m1["tile_rows"] > 0
