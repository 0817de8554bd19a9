"""OsmChange-style XML diff source.

The reference parses `.osc[.gz]` files event-by-event
(/root/reference/src/osmxml.rs:382-785: <create>/<modify>/<delete>
wrapper elements, element attributes, optional <bbox> children). Our
engine's change batches are DataFrames; this source turns a directory
of XML diffs into that DataFrame distributedly:

  binaryFile scan (one row per file) -> mapInPandas parse (stdlib
  ElementTree per file, gzip-sniffed) -> change rows.

So the *parse* scales with the number of files (each task parses whole
files — diffs are small and line-oriented work poorly for XML), while
everything downstream is ordinary set-based work. The state number is
recovered from the filename (the reference's 3/3/3 sharded layout,
/root/reference/src/update.rs:76-82).

Writer: ``format_osc`` emits the action-grouped XML shape
(/root/reference/src/osmxml.rs:72-101 write_action_start) for
interop/round-trip tests.
"""

from __future__ import annotations

import gzip
import io
import os
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.coords import coord_to_decimicro_py

CHANGE_SCHEMA = (
    "state long, seq long, action string, image_id string, "
    "new_lat long, new_lon long, new_caption string, new_phash long"
)

_ACTIONS = ("create", "modify", "delete")


def parse_osc_bytes(data: bytes, state: int) -> list[dict]:
    """One .osc[.gz] payload -> change rows (document order = seq)."""
    if data[:2] == b"\x1f\x8b":  # gzip magic, like the reference's sniffing
        data = gzip.decompress(data)
    root = ET.parse(io.BytesIO(data)).getroot()
    rows: list[dict] = []
    seq = 0
    for group in root:
        if group.tag not in _ACTIONS:
            continue
        for el in group:
            if el.tag != "node":  # engine model: point elements
                continue
            lat = el.get("lat")
            lon = el.get("lon")
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            rows.append(
                {
                    "state": state,
                    "seq": seq,
                    "action": group.tag,
                    "image_id": el.get("id"),
                    "new_lat": coord_to_decimicro_py(float(lat)) if lat else None,
                    "new_lon": coord_to_decimicro_py(float(lon)) if lon else None,
                    "new_caption": tags.get("caption"),
                    "new_phash": int(tags["phash"]) if "phash" in tags else None,
                }
            )
            seq += 1
    return rows


def state_from_path(path: str) -> int:
    """Recover the state number from .../AAA/BBB/CCC.osc[.gz] (the
    reference's sharded layout) or from a bare <N>.osc name."""
    m = re.search(r"(?:(\d{3})/(\d{3})/)?(\d+)\.osc(?:\.gz)?$", path)
    if not m:
        raise ValueError(f"cannot extract state from {path}")
    a, b, c = m.groups()
    if a is not None:
        return int(a) * 1_000_000 + int(b) * 1_000 + int(c)
    return int(c)


def read_osc_dir(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan of a diff directory into the change DataFrame."""
    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.osc*"
    ).option("recursiveFileLookup", "true").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                out.extend(parse_osc_bytes(bytes(content), state_from_path(p)))
            yield pd.DataFrame(
                out,
                columns=[
                    "state", "seq", "action", "image_id",
                    "new_lat", "new_lon", "new_caption", "new_phash",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, CHANGE_SCHEMA)


def format_osc(rows: list[dict]) -> str:
    """Change rows -> action-grouped OsmChange XML (wrapper opens/closes
    when the action changes between consecutive rows, exactly the
    reference writer's grouping rule)."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>', '<osmChange version="0.6">']
    current = None
    for r in sorted(rows, key=lambda r: r["seq"]):
        if r["action"] != current:
            if current is not None:
                out.append(f"</{current}>")
            current = r["action"]
            out.append(f"<{current}>")
        attrs = f' id="{r["image_id"]}"'
        if r.get("new_lat") is not None:
            attrs += f' lat="{r["new_lat"] / 1e7:.7f}" lon="{r["new_lon"] / 1e7:.7f}"'
        tags = ""
        if r.get("new_caption") is not None:
            cap = (
                str(r["new_caption"]).replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
            )
            tags += f'<tag k="caption" v="{cap}"/>'
        if r.get("new_phash") is not None:
            tags += f'<tag k="phash" v="{r["new_phash"]}"/>'
        if tags:
            out.append(f"<node{attrs}>{tags}</node>")
        else:
            out.append(f"<node{attrs}/>")
    if current is not None:
        out.append(f"</{current}>")
    out.append("</osmChange>")
    return "\n".join(out) + "\n"


def write_osc_tree(changes_pdf: pd.DataFrame, root: str, gz: bool = True) -> list[str]:
    """Write per-state diffs into the reference's 3/3/3 sharded tree."""
    paths = []
    for state, grp in changes_pdf.groupby("state"):
        a, b, c = state // 1_000_000 % 1000, state // 1_000 % 1000, state % 1000
        d = os.path.join(root, f"{a:03d}", f"{b:03d}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{c:03d}.osc" + (".gz" if gz else ""))
        payload = format_osc(grp.to_dict("records")).encode()
        if gz:
            payload = gzip.compress(payload)
        with open(p, "wb") as f:
            f.write(payload)
        paths.append(p)
    return paths
