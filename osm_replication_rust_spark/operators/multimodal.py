"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata (w, h, fmt),
per the input_hint table shape. The Spark-side machinery — schemas,
Arrow batch shapes, mapInPandas iterators, partition sizing — is real
and tested; the actual codec is STUBBED (no PIL/libjpeg in this image):

- ``decode_image``     -> NotImplementedError (clearly-marked stub)
- ``fake_decode``      -> deterministic pixel array from (bytes, w, h),
                          the test codec: byte k of the payload is pixel
                          k's value, cycled — matches datagen.synth

PSNR verification (BASELINE.json: decoded-pixel allclose, PSNR >= 40 dB
for lossy) runs vectorized over numpy arrays inside mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """Real codec entry point — STUB. A deployment wires PIL/turbojpeg
    here; the container image has no codec libs."""
    raise NotImplementedError(
        "image codecs not available in this environment; use fake_decode "
        "for the deterministic test path"
    )


def fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in codec: payload bytes cycled into (h, w)."""
    b = np.frombuffer(payload, dtype=np.uint8)
    need = w * h
    if len(b) < need:
        b = np.resize(b, need)
    return b[:need].reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def decode_stats(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """mapInPandas pipeline stage: decode (fake codec) + per-image pixel
    stats. Demonstrates the real batch shape: binary in, struct out,
    whole batch handled as one numpy block per Arrow batch."""
    fields = [f"{c} {t}" for c, t in df.dtypes]
    out_schema = ", ".join(fields + ["pix_mean double", "pix_max int", "pix_min int"])

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, maxs, mins = [], [], []
            for payload, w, h in zip(pdf[bytes_col], pdf["w"], pdf["h"]):
                px = fake_decode(payload, int(w), int(h))
                means.append(float(px.mean()))
                maxs.append(int(px.max()))
                mins.append(int(px.min()))
            yield pdf.assign(pix_mean=means, pix_max=maxs, pix_min=mins)

    return df.mapInPandas(stage, out_schema)


def resize_stage(df: DataFrame, out_w: int, out_h: int, bytes_col: str = "bytes") -> DataFrame:
    """Nearest-neighbor resize as a mapInPandas stage: bytes -> bytes,
    metadata columns updated. (The arithmetic is a real resample; only
    the codec is fake.)"""
    keep = [c for c in df.columns if c not in (bytes_col, "w", "h")]
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.dtypes if c in keep]
        + [f"{bytes_col} binary", "w int", "h int"]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, w, h in zip(pdf[bytes_col], pdf["w"], pdf["h"]):
                px = fake_decode(payload, int(w), int(h))
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                payloads.append(px[np.ix_(yi, xi)].tobytes())
            out = pdf[keep].copy()
            out[bytes_col] = payloads
            out["w"] = out_w
            out["h"] = out_h
            yield out

    return df.mapInPandas(stage, out_schema)


def frame_sample(
    df: DataFrame,
    n_samples: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Video frame sampling as a mapInPandas stage: the binary payload is
    treated as n_frames concatenated w*h frames; ``n_samples`` frames are
    taken at uniform temporal offsets (the standard pretraining sampling
    strategy), one output ROW per sampled frame. Codec stubbed as
    elsewhere (raw frames); the plumbing — batch iteration, per-row
    explode into multiple rows, binary slicing — is the real shape."""
    out_schema = f"{id_col} string, frame_idx int, n_frames int, {bytes_col} binary, w int, h int"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, nfr, frames, ws, hs = [], [], [], [], [], []
            for rid, payload, w, h in zip(
                pdf[id_col], pdf[bytes_col], pdf["w"], pdf["h"]
            ):
                fsize = int(w) * int(h)
                n_frames = max(len(payload) // fsize, 1) if fsize else 1
                take = np.unique(
                    (np.arange(n_samples) * n_frames) // max(n_samples, 1)
                )
                take = take[take < n_frames]
                for k in take:
                    ids.append(rid)
                    fidx.append(int(k))
                    nfr.append(int(n_frames))
                    frames.append(bytes(payload[k * fsize : (k + 1) * fsize]))
                    ws.append(int(w))
                    hs.append(int(h))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": fidx,
                    "n_frames": nfr,
                    bytes_col: frames,
                    "w": ws,
                    "h": hs,
                }
            )

    return df.mapInPandas(stage, out_schema)


def psnr_check(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    min_db: float = 40.0,
) -> DataFrame:
    """Per-row decoded-pixel comparison (the BASELINE.json invariant):
    join the two tables on id and compute PSNR inside mapInPandas.
    Returns (id, psnr_db, ok)."""
    l = left.select(F.col(id_col), F.col(bytes_col).alias("_lb"), "w", "h")
    r = right.select(F.col(id_col), F.col(bytes_col).alias("_rb"))
    j = l.join(r, id_col, "inner")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals, oks = [], []
            for lb, rb, w, h in zip(pdf["_lb"], pdf["_rb"], pdf["w"], pdf["h"]):
                p = psnr(fake_decode(lb, int(w), int(h)), fake_decode(rb, int(w), int(h)))
                vals.append(p if np.isfinite(p) else 1e9)
                oks.append(bool(p >= min_db))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "psnr_db": vals, "ok": oks}
            )

    return j.mapInPandas(stage, f"{id_col} string, psnr_db double, ok boolean")
