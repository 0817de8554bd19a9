"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k by cosine, the correctness
  baseline. The dot product runs JVM-side via zip_with + aggregate
  (no Python); O(Q*N) — fine for rerank stages and oracles.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH signatures
  (sign bits of projections, computed in a vectorized Arrow UDF over
  numpy), candidates from multi-table bucket joins, exact rerank of
  candidates only. Recall is tunable via (n_tables, n_bits).

Quantized option: ``dot_q`` computes an integer dot product of
round(x*1000) vectors — bit-for-bit reproducible across engines (used
by the DuckDB oracle queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    q_id: str = "query_id",
    i_id: str = "vec_id",
    q_vec: str = "embedding",
    i_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank). Ties broken
    by item id. Query side is broadcast (queries are few; items huge)."""
    q = queries.select(F.col(q_id).alias("_qid"), F.col(q_vec).alias("_qv"))
    it = items.select(F.col(i_id).alias("_iid"), F.col(i_vec).alias("_iv"))
    d = F.broadcast(q).crossJoin(it).withColumn(
        "cosine",
        _dot(F.col("_qv"), F.col("_iv")) / (_norm(F.col("_qv")) * _norm(F.col("_iv"))),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.col("_iid"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(q_id),
            F.col("_iid").alias(i_id),
            "cosine",
            "rank",
        )
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float64)


def lsh_bucket_udf(spark, dim: int, n_tables: int, n_bits: int, seed: int = 13):
    """Arrow-batched signature kernel: per row, one bucket id per table
    (sign bits of hyperplane projections, packed to int64)."""
    planes_bc = spark.sparkContext.broadcast(_hyperplanes(dim, n_tables, n_bits, seed))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(emb: pd.Series) -> pd.Series:
        planes = planes_bc.value  # (T, B, D)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])  # (N, D)
        out = []
        # (T, B, N) projections -> sign bits -> packed ids
        proj = np.einsum("tbd,nd->tbn", planes, mat)
        bits = (proj > 0).astype(np.int64)  # (T, B, N)
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))[None, :, None]
        packed = (bits * weights).sum(axis=1)  # (T, N)
        for i in range(mat.shape[0]):
            out.append([int(packed[t, i]) for t in range(planes.shape[0])])
        return pd.Series(out)

    return buckets


def ann_lsh_topk(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    dim: int,
    q_id: str = "query_id",
    i_id: str = "vec_id",
    vec: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 10,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: multi-table LSH bucket join for candidates,
    exact cosine rerank of candidates only. Output schema matches
    :func:`cosine_topk_bruteforce` (queries with < k candidates return
    fewer rows — measure recall against the brute-force baseline)."""
    spark = queries.sparkSession
    budf = lsh_bucket_udf(spark, dim, n_tables, n_bits, seed)

    def tag(df, idc):
        return df.withColumn("_bkts", budf(F.col(vec))).select(
            F.col(idc),
            F.col(vec),
            F.posexplode("_bkts").alias("table", "bucket"),
        )

    qb = tag(queries, q_id).withColumnRenamed(vec, "_qv")
    ib = tag(items, i_id).withColumnRenamed(vec, "_iv")
    cands = (
        qb.join(ib, ["table", "bucket"], "inner")
        .select(q_id, i_id, "_qv", "_iv")
        .distinct()
    )
    scored = cands.withColumn(
        "cosine",
        _dot(F.col("_qv"), F.col("_iv")) / (_norm(F.col("_qv")) * _norm(F.col("_iv"))),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(i_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, i_id, "cosine", "rank")
    )


def dot_q_expr(a, b):
    """Integer dot product of round(x*1000) quantized vectors — exactly
    reproducible in ANSI SQL (used by oracle queries)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.round(x.cast("double") * 1000).cast("long")
            * F.round(y.cast("double") * 1000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probe-nearest-lists
# ---------------------------------------------------------------------------

def _argmin_centroid_udf(spark, centroids: np.ndarray):
    """id of the nearest centroid per row (squared L2), Arrow-batched."""
    cb = spark.sparkContext.broadcast(centroids.astype(np.float64))

    @F.pandas_udf(T.IntegerType())
    def nearest(emb: pd.Series) -> pd.Series:
        c = cb.value  # (K, D)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])  # (N, D)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
        d = mat @ c.T * -2.0 + (c * c).sum(axis=1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return nearest


def _nprobe_centroids_udf(spark, centroids: np.ndarray, nprobe: int):
    cb = spark.sparkContext.broadcast(centroids.astype(np.float64))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(emb: pd.Series) -> pd.Series:
        c = cb.value
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        d = mat @ c.T * -2.0 + (c * c).sum(axis=1)[None, :]
        order = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(map(list, order)))

    return probes


def train_centroids(
    items: DataFrame,
    dim: int,
    k: int,
    vec: str = "embedding",
    iters: int = 4,
    seed: int = 17,
    sample: int = 4096,
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (coarse
    quantizers are tiny; the expensive part — assignment of the full
    table — happens distributedly in ivf_topk)."""
    pdf = items.select(vec).limit(sample).toPandas()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec]])
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        d = mat @ cent.T * -2.0 + (cent * cent).sum(axis=1)[None, :]
        a = np.argmin(d, axis=1)
        for j in range(k):
            if (a == j).any():
                cent[j] = mat[a == j].mean(axis=0)
    return cent


def ivf_topk(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    dim: int,
    q_id: str = "query_id",
    i_id: str = "vec_id",
    vec: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 17,
) -> DataFrame:
    """IVF ANN: items partitioned into centroid lists once; each query
    scans only its nprobe nearest lists, exact cosine rerank inside.
    Same output schema as cosine_topk_bruteforce."""
    spark = queries.sparkSession
    centroids = train_centroids(items, dim, n_centroids, vec, seed=seed)
    assign = _argmin_centroid_udf(spark, centroids)
    probes = _nprobe_centroids_udf(spark, centroids, nprobe)

    lists = items.select(F.col(i_id), F.col(vec).alias("_iv")).withColumn(
        "_cid", assign(F.col("_iv"))
    )
    qp = queries.select(F.col(q_id), F.col(vec).alias("_qv")).withColumn(
        "_cid", F.explode(probes(F.col("_qv")))
    )
    cands = qp.join(lists, "_cid", "inner")
    scored = cands.withColumn(
        "cosine",
        _dot(F.col("_qv"), F.col("_iv")) / (_norm(F.col("_qv")) * _norm(F.col("_iv"))),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(i_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, i_id, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float,
    dim: int,
    i_id: str = "vec_id",
    vec: str = "embedding",
    n_tables: int = 12,
    n_bits: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the 5th dedup tier):
    multi-table hyperplane LSH candidates -> exact cosine >= threshold.
    (id_a < id_b, cosine) with no false positives; recall is the LSH
    knob, measured in tests."""
    spark = items.sparkSession
    budf = lsh_bucket_udf(spark, dim, n_tables, n_bits, seed)
    tagged = items.select(F.col(i_id), F.col(vec)).withColumn(
        "_bkts", budf(F.col(vec))
    ).select(i_id, vec, F.posexplode("_bkts").alias("table", "bucket"))
    a = tagged.select(
        F.col(i_id).alias("id_a"), F.col(vec).alias("_va"), "table", "bucket"
    )
    b = tagged.select(
        F.col(i_id).alias("id_b"), F.col(vec).alias("_vb"), "table", "bucket"
    )
    cands = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .distinct()
    )
    return (
        cands.withColumn(
            "cosine",
            _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
