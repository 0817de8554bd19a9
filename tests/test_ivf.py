"""IVF ANN + embedding near-dup pairs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dup_pairs,
    ivf_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def clustered_items(spark):
    """Items with cluster structure (IVF's sweet spot) + planted near-dups."""
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, DIM)) * 4
    rows, ids = [], []
    for i in range(600):
        c = centers[i % 8]
        rows.append((c + rng.standard_normal(DIM)).astype(np.float32))
        ids.append(i)
    # planted near-duplicates of items 0..4 (tiny noise)
    for j in range(5):
        rows.append((np.asarray(rows[j]) + rng.standard_normal(DIM) * 1e-3).astype(np.float32))
        ids.append(1000 + j)
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": list(map(list, rows))})
    ).persist()


def test_ivf_recall(spark, clustered_items):
    items = clustered_items
    queries = items.filter(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    k = 10
    exact = {}
    for r in cosine_topk_bruteforce(queries, items, k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in ivf_topk(queries, items, k, DIM, n_centroids=8, nprobe=3).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[q] & approx.get(q, set())) / k for q in exact]
    assert np.mean(recalls) >= 0.8, recalls


def test_embedding_near_dup(spark, clustered_items):
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(clustered_items, 0.999, DIM).collect()
    }
    for j in range(5):
        assert (j, 1000 + j) in got, (j, got)
    # exactness: every reported pair really is >= threshold (no false pos)
    brute = clustered_items.toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in brute.itertuples(index=False, name="R")}
    for a, b in got:
        va, vb = vecs[a], vecs[b]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert cos >= 0.999 - 1e-9


def test_time_travel(spark, tmp_path):
    import pandas as pd

    from osm_replication_rust_spark.operators.merge import TableStore

    base = spark.createDataFrame(pd.DataFrame({"image_id": ["a"], "caption": ["c0"], "phash": [1]}))
    store = TableStore(spark, str(tmp_path / "t"))
    store.init(base)
    ch = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a"], "action": ["modify"], "seq": [0], "new_caption": ["c1"], "new_phash": [None]}).astype({"new_phash": "object"})
    )
    store.apply_batch(3, ch)
    assert store.as_of(0).collect()[0].caption == "c0"
    assert store.as_of(2).collect()[0].caption == "c0"  # newest <= 2 is v0
    assert store.as_of(3).collect()[0].caption == "c1"
    assert store.as_of(99).collect()[0].caption == "c1"
    with pytest.raises(ValueError):
        store.as_of(-1)
