"""Property-based codec tests (hypothesis, no Spark): the winnowing
kernel chunker and the geohash integer-bisection twin must agree with
independent scalar references on arbitrary inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from osm_replication_rust_spark.functions.coords import (
    GEOHASH_ALPHABET,
    py_geohash,
)
from osm_replication_rust_spark.operators.dedup import (
    WINNOW_BASE,
    WINNOW_MOD,
    WINNOW_PACK,
    _winnow_chunks,
)


def _ref_winnow(text, k=5, w=4):
    if len(text) < k:
        return []
    hs = []
    for i in range(len(text) - k + 1):
        h = ord(text[i])
        for j in range(1, k):
            h = (h * WINNOW_BASE + ord(text[i + j])) % WINNOW_MOD
        hs.append(h)
    out = set()
    for p in range(1, max(len(hs) - w + 1, 1) + 1):
        sl = hs[p - 1 : p - 1 + w]
        m = min(sl)
        j = p + len(sl) - 1 - sl[::-1].index(m)
        out.add(j * WINNOW_PACK + m)
    return sorted(out)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=120,
        ),
        max_size=12,
    )
)
def test_winnow_kernel_property(texts):
    got = {}
    for idx, S, keep in _winnow_chunks(pd.Series(texts, dtype=object), 5, 4):
        for r, i in enumerate(idx):
            got[int(i)] = sorted(S[r, keep[r]].tolist()) if S.shape[1] else []
    for i, t in enumerate(texts):
        assert got.get(i, []) == _ref_winnow(t), (i, t)


def _float_bisect_geohash(lon_deg, lat_deg, chars=8):
    """Independent reference: the classic float-interval bisection."""
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    s, bit, idx, even = "", 0, 0, True
    while len(s) < chars:
        if even:
            mid = (lo_x + hi_x) / 2
            if lon_deg >= mid:
                idx = idx * 2 + 1
                lo_x = mid
            else:
                idx *= 2
                hi_x = mid
        else:
            mid = (lo_y + hi_y) / 2
            if lat_deg >= mid:
                idx = idx * 2 + 1
                lo_y = mid
            else:
                idx *= 2
                hi_y = mid
        even = not even
        bit += 1
        if bit == 5:
            s += GEOHASH_ALPHABET[idx]
            bit, idx = 0, 0
    return s


@settings(max_examples=200, deadline=None)
@given(
    st.integers(-1_799_999_999, 1_799_999_999),
    st.integers(-899_999_999, 899_999_999),
)
def test_geohash_matches_float_bisection(lon, lat):
    """The exact-integer twin equals classic float bisection whenever
    the decimicro value is not exactly ON a bisection boundary (where
    float rounding of mid is ambiguous); boundary multiples of 5^9
    decimicro are excluded by construction below."""
    # bisection midpoints after b steps sit at span/2^b grid — decimicro
    # coords land exactly on one only when divisible by a high power of
    # 5; skip those rare ambiguous points
    if lon % 1_953_125 == 0 or lat % 1_953_125 == 0:
        return
    assert py_geohash(lon, lat) == _float_bisect_geohash(
        lon / 1e7, lat / 1e7
    )


# ---------------------------------------------------------------------------
# hilbert: the automaton spelling (Klein-group swap/complement flags,
# arithmetic xor — what the Spark Project chain and the DuckDB nested
# subqueries evaluate) must agree with the CLASSIC xy2d rotate/swap loop
# (the textbook algorithm, an independent spelling that mutates the
# coordinates instead of accumulating a transform), and consecutive ids
# must be 4-adjacent cells — the property that defines the curve.
# ---------------------------------------------------------------------------


def _classic_xy2d(x, y, levels):
    d = 0
    s = 1 << (levels - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _classic_d2xy(d, levels):
    n = 1 << levels
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _auto_xy(cx, cy, levels):
    """py_hilbert's automaton on raw cell coords (py_hilbert itself
    takes decimicro lon/lat; this isolates the curve math)."""
    from osm_replication_rust_spark.functions.coords import (
        DEFAULT_RES,
        py_hilbert,
    )

    # build a decimicro point that lands exactly in cell (cx, cy)
    lon = (cx << DEFAULT_RES) - 1_800_000_000
    lat = (cy << DEFAULT_RES) - 900_000_000
    return py_hilbert(lon, lat, DEFAULT_RES, levels)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 12) - 1),
    st.integers(min_value=0, max_value=(1 << 12) - 1),
)
def test_hilbert_automaton_matches_classic_loop(cx, cy):
    assert _auto_xy(cx, cy, 12) == _classic_xy2d(cx, cy, 12)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 24) - 2))
def test_hilbert_consecutive_ids_are_adjacent_cells(d):
    x1, y1 = _classic_d2xy(d, 12)
    x2, y2 = _classic_d2xy(d + 1, 12)
    assert abs(x1 - x2) + abs(y1 - y2) == 1
    # and the automaton round-trips both endpoints
    assert _auto_xy(x1, y1, 12) == d
    assert _auto_xy(x2, y2, 12) == d + 1


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-1_700_000_000, max_value=1_600_000_000),
    st.integers(min_value=-800_000_000, max_value=700_000_000),
    st.integers(min_value=0, max_value=10),
    st.integers(min_value=0, max_value=10),
)
def test_hilbert_ranges_cover_exactly(lon0, lat0, w_cells, h_cells):
    """Unbudgeted cover == brute-force enumeration of every cell id in
    the bbox; budgeted cover stays a superset within the range cap."""
    from osm_replication_rust_spark.functions.coords import (
        DEFAULT_RES,
        cell_xy,
        hilbert_ranges,
        py_hilbert,
    )

    edge = 1 << DEFAULT_RES
    bbox = (lon0, lat0, lon0 + w_cells * edge, lat0 + h_cells * edge)
    ranges = hilbert_ranges(*bbox, max_ranges=10**9)
    x0, y0 = cell_xy(bbox[0], bbox[1])
    x1, y1 = cell_xy(bbox[2], bbox[3])
    want = {
        py_hilbert(cx * edge - 1_800_000_000, cy * edge - 900_000_000)
        for cx in range(x0, x1 + 1)
        for cy in range(y0, y1 + 1)
    }
    got = set()
    for lo, hi in ranges:
        got.update(range(lo, hi + 1))
    assert got == want
    # ranges are sorted, disjoint, non-adjacent (fully merged)
    for (l1, h1), (l2, h2) in zip(ranges[:-1], ranges[1:]):
        assert h1 + 1 < l2
    budgeted = hilbert_ranges(*bbox, max_ranges=4)
    assert len(budgeted) <= 4
    got_b = set()
    for lo, hi in budgeted:
        got_b.update(range(lo, hi + 1))
    assert got_b >= want
