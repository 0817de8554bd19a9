"""Count-min sketch: one-sided guarantee, bounded state, heavy-hitter
screen exactness, and bit-level slot parity with the DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    heavy_hitters,
    sql_cms_estimate,
    sql_slot,
    _slot,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # zipf-ish skew: key k appears 1000//(k+1) times — one hot key,
    # a long tail
    rows = [(k,) for k in range(60) for _ in range(1000 // (k + 1))]
    return spark.createDataFrame(rows, "k long").repartition(8).persist()


def test_cms_never_undercounts_and_state_is_bounded(spark, keyed):
    depth, width = 4, 256
    sk = cms_build(keyed, "k", depth, width).persist()
    assert sk.count() <= depth * width
    # every d row's counters sum to the full input size
    per_d = {r.d: r.total for r in sk.groupBy("d").agg(F.sum("cnt").alias("total")).collect()}
    n = keyed.count()
    assert per_d == {d: n for d in range(depth)}

    est = {
        r.k: r.cms_est
        for r in cms_estimate(keyed.select("k").distinct(), sk, "k", depth, width).collect()
    }
    true = {r.k: r.c for r in keyed.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_cms_unseen_key_estimates_zero_or_collision(spark, keyed):
    sk = cms_build(keyed, "k", 4, 256)
    probe = spark.createDataFrame([(10_000_000,)], "k long")
    [r] = cms_estimate(probe, sk, "k", 4, 256).collect()
    assert r.cms_est >= 0  # 0 unless all 4 slots collide with real keys


def test_heavy_hitters_exact_vs_groupby(spark, keyed):
    thr = 90
    got = {r.k: r.exact_cnt for r in heavy_hitters(keyed, "k", thr, 4, 256).collect()}
    true = {
        r.k: r.c
        for r in keyed.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
        if r.c >= thr
    }
    assert got == true
    # and the screen's estimates never undercut the exact counts
    for r in heavy_hitters(keyed, "k", thr, 4, 256).collect():
        assert r.cms_est >= r.exact_cnt


def test_width_must_be_power_of_two(spark, keyed):
    with pytest.raises(ValueError, match="power of two"):
        cms_build(keyed, "k", 4, 1000)
    with pytest.raises(ValueError, match="power of two"):
        sql_cms_estimate("t", "k", width=768)


def test_slot_parity_with_duckdb(spark):
    """The Spark slot (signed & mask) equals the DuckDB slot
    (UBIGINT % power-of-two) for every probed key and depth row."""
    keys = [0, 1, 7, 123456789, -5, 2**40 + 3]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for d in (0, 3):
        spark_slots = {
            r.k: r.s
            for r in df.select("k", _slot(F.col("k"), d, 1024).alias("s")).collect()
        }
        for k in keys:
            [(duck,)] = duckdb.sql(
                f"SELECT {sql_slot(str(k), d, 1024)}"
            ).fetchall()
            assert spark_slots[k] == duck, (k, d)


def test_estimate_parity_with_duckdb_twin(spark, keyed):
    """Full estimate parity: the DuckDB twin rebuilt from the same rows
    produces the identical (key, estimate) map."""
    pdf = keyed.toPandas()  # noqa: F841 — registered below
    con = duckdb.connect()
    con.register("events_like", pdf)
    sql = sql_cms_estimate("events_like", "k", depth=4, width=256, key_alias="k")
    duck = {k: e for k, e in con.execute(sql).fetchall()}
    sk = cms_build(keyed, "k", 4, 256)
    got = {
        r.k: r.cms_est
        for r in cms_estimate(keyed.select("k").distinct(), sk, "k", 4, 256).collect()
    }
    assert got == duck


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hll_df(spark):
    # 3 groups with distinct-key counts 2500 / 1250 / 834
    rows = [(i, f"g{i % 3}") for i in range(2500)] + [
        (i, "g0") for i in range(2500)  # g0 keys repeated: distincts unchanged
    ]
    return spark.createDataFrame(rows, "k long, g string").repartition(8).persist()


def test_hll_estimate_accuracy_and_state_bound(spark, hll_df):
    from osm_replication_rust_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    regs = hll_registers(hll_df, "k", p=8, group_cols=["g"]).persist()
    # state bound: <= 2^p register rows per group
    per_g = {r.g: r.c for r in regs.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert all(c <= 256 for c in per_g.values())

    est = {r.g: r.hll_est for r in hll_estimate(regs, p=8, group_cols=["g"]).collect()}
    true = {
        r.g: r.c
        for r in hll_df.groupBy("g")
        .agg(F.countDistinct("k").alias("c"))
        .collect()
    }
    for g, t in true.items():
        assert abs(est[g] - t) / t < 0.25, (g, est[g], t)  # ~4 sigma at p=8


def test_hll_register_union_property(spark, hll_df):
    """Registers of a union == MAX-merge of the parts' registers —
    the property that lets a cube (or day+day) reuse fine registers."""
    from osm_replication_rust_spark.operators.sketch import hll_registers

    fine = hll_registers(hll_df, "k", p=8, group_cols=["g"])
    merged = {
        r.bucket: r.reg
        for r in fine.groupBy("bucket").agg(F.max("reg").alias("reg")).collect()
    }
    direct = {
        r.bucket: r.reg for r in hll_registers(hll_df, "k", p=8).collect()
    }
    assert merged == direct


def test_hll_estimate_parity_with_duckdb(spark, hll_df):
    from osm_replication_rust_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
        sql_hll_estimate,
    )

    con = duckdb.connect()
    con.register("t", hll_df.toPandas())
    duck = {
        g: e
        for g, e in con.execute(
            sql_hll_estimate("t", "k", p=8, group_exprs=["g"])
        ).fetchall()
    }
    got = {
        r.g: r.hll_est
        for r in hll_estimate(
            hll_registers(hll_df, "k", p=8, group_cols=["g"]), p=8, group_cols=["g"]
        ).collect()
    }
    assert got == duck  # bit-identical doubles, not approximately equal


def test_hll_p_validation(spark, hll_df):
    from osm_replication_rust_spark.operators.sketch import (
        hll_registers,
        sql_hll_estimate,
    )

    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        hll_registers(hll_df, "k", p=2)
    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        sql_hll_estimate("t", "k", p=20)
