"""Interleaved A/B: band keys projected AFTER the signature aggregate
(round-4 shape, arm A) vs computed INSIDE the aggregate (round-5 shape,
arm B). One Spark session, alternating passes, min-of-N per arm — the
protocol BENCH.md prescribes for this host's noise band.

Both arms build the complete minhash_lsh_pairs plan over the SAME
sf-table fixture the catalog query uses and count the result; only the
signature/banding construction differs. Usage:
    python tools/ab_minhash_bands.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from osm_replication_rust_spark.operators import dedup  # noqa: E402
from osm_replication_rust_spark.session import get_spark  # noqa: E402


def _fixture(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    return d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )


def _pairs_arm_a(u):
    """Round-4 shape: 32 sig columns out of the agg, bands projected."""
    sh = dedup._drop_hot_shingles(
        dedup.word_shingles(u, "text", "doc_id", 3), dedup.DEFAULT_MAX_SHINGLE_DF
    )
    h = sh.withColumn("h", F.abs(F.xxhash64(F.col("shingle"))))
    params = dedup._hash_params(32, 7)
    hp = F.col("h") % dedup.MINHASH_PRIME
    sig_aggs = [
        F.min((F.lit(ai) * hp + F.lit(bi)) % dedup.MINHASH_PRIME).alias(f"sig_{i}")
        for i, (ai, bi) in enumerate(params)
    ]
    per_doc = h.groupBy(F.col("id")).agg(
        *sig_aggs,
        F.collect_set("shingle").alias("_shset"),
        F.count(F.lit(1)).alias("_sz"),
    ).persist()
    band_cols = [
        F.xxhash64(*[F.col(f"sig_{b * 4 + r}") for r in range(4)], F.lit(b)).alias(
            f"band_{b}"
        )
        for b in range(8)
    ]
    stacked = per_doc.select("id", *band_cols).select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                for b in range(8)
            ])
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = stacked.select(F.col("id").alias("id_a"), "band", "bucket")
    b = stacked.select(F.col("id").alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    slim = per_doc.select("id", "_shset", "_sz")
    out = (
        cands.join(
            slim.select(F.col("id").alias("id_a"), F.col("_shset").alias("_sa"),
                        F.col("_sz").alias("sz_a")), "id_a")
        .join(
            slim.select(F.col("id").alias("id_b"), F.col("_shset").alias("_sb"),
                        F.col("_sz").alias("sz_b")), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )
    return out, per_doc


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-minhash", cpus=32)
    u = _fixture(spark, sf_dir)

    # warmup both arms once (JIT, python workers, parquet footer cache)
    oa, pa = _pairs_arm_a(u)
    oa.count(); pa.unpersist()
    dedup.minhash_lsh_pairs(u, "text", "doc_id").count()

    ta, tb, rows = [], [], set()
    for _ in range(passes):
        out, per_doc = _pairs_arm_a(u)
        t = time.time(); na = out.count(); ta.append(time.time() - t)
        per_doc.unpersist()
        t = time.time()
        nb = dedup.minhash_lsh_pairs(u, "text", "doc_id").count()
        tb.append(time.time() - t)
        # arm B persists its per_doc internally and never hands it back;
        # drop ALL cached frames so neither arm accumulates block-manager
        # storage across passes (keeps the interleaved min-of-N fair)
        spark.catalog.clearCache()
        rows.add((na, nb))
    print(f"rows (a, b) per pass: {sorted(rows)}")
    print(f"arm A (bands projected post-agg): {[round(x, 2) for x in ta]}  min={min(ta):.2f}")
    print(f"arm B (bands inside agg):         {[round(x, 2) for x in tb]}  min={min(tb):.2f}")
    print(f"min-ratio A/B = {min(ta) / min(tb):.2f}")


if __name__ == "__main__":
    main()
