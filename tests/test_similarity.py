"""Similarity search: brute-force cosine vs numpy oracle; LSH ANN recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk_bruteforce,
)

DIM = 16


def make_vecs(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    return v


@pytest.fixture(scope="module")
def items(spark):
    v = make_vecs(800, 1)
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(800), "embedding": list(map(list, v))})
    ).persist()


@pytest.fixture(scope="module")
def queries(spark):
    v = make_vecs(10, 2)
    return spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(10), "embedding": list(map(list, v))})
    ).persist()


def numpy_topk(qv, iv, k):
    qs = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    its = iv / np.linalg.norm(iv, axis=1, keepdims=True)
    sims = qs @ its.T
    out = {}
    for qi in range(len(qv)):
        order = np.lexsort((np.arange(len(iv)), -sims[qi]))[:k]
        out[qi] = list(order)
    return out


def test_bruteforce_vs_numpy(spark, items, queries):
    k = 10
    want = numpy_topk(make_vecs(10, 2), make_vecs(800, 1), k)
    got = {}
    for r in cosine_topk_bruteforce(queries, items, k).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    got = {q: [v for _, v in sorted(rs)] for q, rs in got.items()}
    assert got == want


def test_ann_recall(spark, items, queries):
    k = 10
    exact = {}
    for r in cosine_topk_bruteforce(queries, items, k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in ann_lsh_topk(queries, items, k, DIM, n_tables=12, n_bits=6).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact[q] & approx.get(q, set())) / k for q in exact
    ]
    assert np.mean(recalls) >= 0.7, recalls  # tunable accuracy/cost knob
    # rank-1 (nearest item) almost always survives multi-table LSH
    top1_exact = {
        r.query_id: r.vec_id
        for r in cosine_topk_bruteforce(queries, items, 1).collect()
    }
    hit = sum(1 for q, v in top1_exact.items() if v in approx.get(q, set()))
    assert hit >= 8
