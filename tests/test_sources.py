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


# ---------------------------------------------------------------------------
# GeoJSON interop (sources/geojson.py)
# ---------------------------------------------------------------------------


def test_geojson_roundtrip_exact_on_fixture_regions():
    import json

    import numpy as np

    from osm_replication_rust_spark.plans.entry_queries import fixture_regions
    from osm_replication_rust_spark.sources.geojson import (
        feature_collection,
        parse_geojson,
    )

    regions = fixture_regions()
    fc = feature_collection(regions)
    back = parse_geojson(fc)
    assert [m.region_id for m in back] == [m.region_id for m in regions]
    for a, b in zip(regions, back):
        assert len(a.rings) == len(b.rings)
        for ra, rb in zip(a.rings, b.rings):
            assert ra.hole == rb.hole
            # EXACT point sets (write normalizes winding, not points)
            sa = {tuple(p) for p in np.asarray(ra.coords).tolist()}
            sb = {tuple(p) for p in np.asarray(rb.coords).tolist()}
            assert sa == sb, a.region_id
    # the document is valid JSON with NUMBER coordinates
    doc = json.loads(fc)
    c = doc["features"][0]["geometry"]["coordinates"][0][0][0]
    assert isinstance(c[0], float) and isinstance(c[1], float)


def test_geojson_winding_and_roles():
    import json

    import numpy as np

    from osm_replication_rust_spark.functions.geometry import MultiPolygon, Ring
    from osm_replication_rust_spark.sources.geojson import (
        multipolygon_to_geojson,
        parse_geojson,
    )

    # exterior given CW, hole given CCW: writer must flip both
    ext_cw = np.array([[0, 0], [0, 9], [9, 9], [9, 0]], dtype=np.int64)
    hole_ccw = np.array([[2, 2], [5, 2], [5, 5], [2, 5]], dtype=np.int64)
    mp = MultiPolygon("w", [Ring(ext_cw), Ring(hole_ccw, hole=True)])
    doc = json.loads(multipolygon_to_geojson(mp))
    poly = doc["geometry"]["coordinates"][0]

    def shoelace(ring):
        s = 0
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            s += x1 * y2 - x2 * y1
        return s

    assert shoelace(poly[0]) > 0   # exterior CCW
    assert shoelace(poly[1]) < 0   # hole CW
    # read ignores winding, role comes from position
    back = parse_geojson(json.dumps(doc))[0]
    assert [r.hole for r in back.rings] == [False, True]


def test_geojson_foreign_inputs():
    import pytest as _pytest

    from osm_replication_rust_spark.sources.geojson import (
        _parse_coord,
        parse_geojson,
    )

    # bare geometry, float coords, sub-grid value snaps to nearest
    txt = (
        '{"type": "Polygon", "coordinates":'
        ' [[[1.00000004, 2.0], [3.0, 2.0], [3.0, 4.0], [1.00000004, 4.0]]]}'
    )
    mp = parse_geojson(txt)[0]
    assert mp.region_id == "geojson"
    pts = {tuple(p) for p in mp.rings[0].coords.tolist()}
    assert (10_000_000, 20_000_000) in pts  # 1.00000004 -> nearest grid
    # string coords finer than the grid raise
    with _pytest.raises(ValueError):
        _parse_coord("1.00000004")
    # unsupported geometry type raises
    with _pytest.raises(ValueError):
        parse_geojson('{"type": "LineString", "coordinates": [[0, 0], [1, 1]]}')
