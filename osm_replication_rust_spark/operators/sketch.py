"""Count-min sketch: bounded-state frequency estimation for skewed keys.

The scale problem this solves: an exact per-key count over a 100 TB
corpus shuffles every distinct key — state and exchange grow with
cardinality, and one hot key (the skew the reference's dense-region
handling fights on the geo side) concentrates on one reducer. The
count-min sketch caps the aggregation state at ``depth * width``
counters REGARDLESS of key cardinality: every partition's map-side
combine collapses to at most depth*width partial rows before the one
exchange, so the shuffle is O(d*w) per partition and the final state is
a few KB. Estimates carry the classic one-sided guarantee — never
below the true count, above it by at most eps*N with probability
1-delta (eps = e/width, delta = exp(-depth)); a heavy-hitter screen
then rechecks only the few survivors exactly.

Slot hashes are md5-derived (``dedup.h64_md5``) and ``width`` must be a
power of two, so the signed-int64 low bits Spark computes equal the
UBIGINT low bits DuckDB computes — the oracle rebuilds every counter
and every estimate bit-for-bit (no RNG, no engine-private hash).

No reference analog (the reference keeps exact osmbin counters,
/root/reference/src/osmbin.rs:66-77); this is training-pipeline
infrastructure: hot-key detection before a join, corpus token
frequencies, per-source document counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h64_md5, sql_h64_md5


def _check_width(width: int) -> None:
    if width <= 0 or width & (width - 1):
        raise ValueError(
            f"cms width must be a power of two (signed & unsigned low "
            f"bits must agree across engines), got {width}"
        )


def _slot(key: Column, d: int, width: int) -> Column:
    """Row d's counter slot for a key: low bits of the shared 64-bit
    md5 hash of 'key:d'. Two's-complement & equals unsigned %, so the
    DuckDB twin (sql_slot) lands on the identical slot."""
    return h64_md5(F.concat(key.cast("string"), F.lit(f":{d}"))).bitwiseAND(
        F.lit(width - 1)
    )


def sql_slot(key_expr: str, d: int, width: int) -> str:
    """DuckDB twin of _slot (UBIGINT % power-of-two == signed & mask)."""
    u = f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{d}'), 1, 16))::UBIGINT)"
    return f"CAST({u} % {width} AS BIGINT)"


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: (d, slot, cnt) counter rows, at most
    depth*width of them. ONE aggregation; posexplode is map-side, the
    hash agg's map-side combine bounds every partition's shuffle
    contribution at depth*width rows whatever the input size or skew."""
    _check_width(width)
    key = F.col(key_col)
    slots = F.array(*[_slot(key, d, width) for d in range(depth)])
    return (
        df.select(F.posexplode(slots).alias("d", "slot"))
        .groupBy("d", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the d counters the
    key hashes to. The sketch is tiny by construction, so it
    broadcasts — the probe side never shuffles. Keys the sketch never
    saw estimate 0 (left join + coalesce), preserving est >= true."""
    _check_width(width)
    key = F.col(key_col)
    slots = F.array(*[_slot(key, d, width) for d in range(depth)])
    ex = keys.select(key_col, F.posexplode(slots).alias("d", "slot"))
    return (
        ex.join(F.broadcast(sketch), ["d", "slot"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def sql_cms_estimate(
    table: str,
    key_expr: str,
    depth: int = 4,
    width: int = 1024,
    est_col: str = "cms_est",
    key_alias: str = "key",
) -> str:
    """DuckDB twin: rebuild the counters and the min-over-depth
    estimate for every distinct key of ``table``. Returns a SELECT
    yielding (key_alias, est_col)."""
    _check_width(width)
    counters = "\n      UNION ALL\n      ".join(
        f"SELECT {d} AS d, {sql_slot(key_expr, d, width)} AS slot, "
        f"COUNT(*) AS cnt FROM {table} GROUP BY 2"
        for d in range(depth)
    )
    probes = "\n      UNION ALL\n      ".join(
        f"SELECT {key_expr} AS {key_alias}, {d} AS d, "
        f"{sql_slot(key_expr, d, width)} AS slot FROM dk"
        for d in range(depth)
    )
    return f"""
    WITH dk AS (SELECT DISTINCT {key_expr} FROM {table}),
    counters AS (
      {counters}
    ),
    probes AS (
      {probes}
    )
    SELECT p.{key_alias},
           CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS {est_col}
    FROM probes p
    LEFT JOIN counters c ON c.d = p.d AND c.slot = p.slot
    GROUP BY p.{key_alias}
    """


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Keys whose TRUE count is >= threshold, found sketch-first: the
    CM estimate never undercounts, so screening on est >= threshold
    loses nothing; only the (few, by the eps*N bound) surviving keys
    get an exact recount. Returns (key, cms_est, exact_cnt) for keys
    with exact_cnt >= threshold."""
    sk = cms_build(df, key_col, depth, width)
    est = cms_estimate(
        df.select(key_col).distinct(), sk, key_col, depth, width
    ).filter(F.col("cms_est") >= threshold)
    exact = (
        df.join(F.broadcast(est), key_col)
        .groupBy(key_col, "cms_est")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return exact.filter(F.col("exact_cnt") >= threshold)
