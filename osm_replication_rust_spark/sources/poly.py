"""Osmosis `.poly` polygon file parser + region-directory tree scan.

Format (reference /root/reference/src/osmgeom.rs:15-62):
  line 1: region name
  then per ring: a header line (ring name; leading '!' marks a hole),
  coordinate lines "lon lat" (floats, degrees), terminated by "END";
  file terminated by a final "END".

Directory hierarchy (reference /root/reference/src/diffs.rs:195-260):
  a directory `x/` pairs with `x.poly` to form an interior region whose
  children are the entries inside `x/`; bare `y.poly` files are leaves.
  Deterministic ordering: children sorted by path (reference
  /root/reference/src/diffs.rs:239-246).

Parsing runs on the driver: region trees are small (thousands of
files), and the result is broadcast anyway.
"""

from __future__ import annotations

import os

import numpy as np

from ..functions.coords import coord_to_decimicro_py
from ..functions.geometry import MultiPolygon, Ring


def parse_poly(text: str, region_id: str, parent_id: str | None = None) -> MultiPolygon:
    lines = [ln.strip() for ln in text.splitlines()]
    if not lines:
        raise ValueError(f"empty .poly for {region_id}")
    rings: list[Ring] = []
    i = 1  # skip the name line
    while i < len(lines):
        header = lines[i]
        if header == "END" or header == "":
            i += 1
            continue
        hole = header.startswith("!")
        i += 1
        coords = []
        while i < len(lines) and lines[i] != "END":
            if lines[i]:
                lon_s, lat_s = lines[i].split()[:2]
                # decimicro rounding exactly as the reference
                # (/root/reference/src/osm.rs:137-139): half away from
                # zero, not Python round()'s half-to-even
                coords.append(
                    (
                        coord_to_decimicro_py(float(lon_s)),
                        coord_to_decimicro_py(float(lat_s)),
                    )
                )
            i += 1
        i += 1  # consume ring END
        if coords:
            rings.append(Ring(np.array(coords, dtype=np.int64), hole=hole))
    if not rings:
        raise ValueError(f"no rings in .poly for {region_id}")
    return MultiPolygon(region_id, rings, parent_id=parent_id)


def format_poly(mp: MultiPolygon) -> str:
    """Inverse of parse_poly (round-trip tested)."""
    out = [mp.region_id.rsplit("/", 1)[-1]]
    for i, r in enumerate(mp.rings, 1):
        out.append(f"!{i}" if r.hole else str(i))
        for lon, lat in r.coords:
            out.append(f"   {lon / 1e7:.7E}   {lat / 1e7:.7E}")
        out.append("END")
    out.append("END")
    return "\n".join(out) + "\n"


def regions_from_dir(root: str) -> list[MultiPolygon]:
    """Walk a polygon directory tree into the flat region list the
    engine's operators take. region_id = relative hierarchy path."""
    out: list[MultiPolygon] = []

    def walk(d: str, parent: str | None) -> None:
        entries = sorted(os.listdir(d))
        for e in entries:
            if not e.endswith(".poly"):
                continue
            name = e[: -len(".poly")]
            rid = f"{parent}/{name}" if parent else name
            with open(os.path.join(d, e)) as f:
                out.append(parse_poly(f.read(), rid, parent_id=parent))
            sub = os.path.join(d, name)
            if os.path.isdir(sub):
                walk(sub, rid)

    walk(root, None)
    return out


def write_region_dir(regions: list[MultiPolygon], root: str) -> None:
    """Materialize a region list as a .poly directory tree (fixture
    round-trip helper)."""
    for mp in regions:
        parts = mp.region_id.split("/")
        d = os.path.join(root, *parts[:-1])
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, parts[-1] + ".poly"), "w") as f:
            f.write(format_poly(mp))
