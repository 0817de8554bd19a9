"""kNN: cell-ring expansion must agree exactly with brute force."""

import pandas as pd
import numpy as np
import pytest

from osm_replication_rust_spark.operators.knn import knn_bruteforce, knn_cell_ring

M = 1_000_000


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(5)
    n = 3000
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": np.arange(n),
                "lat": rng.integers(-15 * M, 15 * M, n),
                "lon": rng.integers(-15 * M, 15 * M, n),
            }
        )
    ).persist()


@pytest.fixture(scope="module")
def qry(spark):
    rng = np.random.default_rng(6)
    n = 40
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(n),
                # includes queries near the data edge (sparse rings force
                # expansion and the brute-force fallback)
                "lat": rng.integers(-20 * M, 20 * M, n),
                "lon": rng.integers(-20 * M, 20 * M, n),
            }
        )
    ).persist()


def test_cell_ring_equals_bruteforce(spark, pts, qry):
    k = 5
    want = {
        (r.query_id, r.rank): (r.point_id, r.dist2)
        for r in knn_bruteforce(qry, pts, k).collect()
    }
    got = {
        (r.query_id, r.rank): (r.point_id, r.dist2)
        for r in knn_cell_ring(qry, pts, k).collect()
    }
    assert got == want
    assert len({q for q, _ in got}) == 40  # every query answered
    assert all((q, r) in got for q in range(40) for r in range(1, k + 1))


def test_knn_more_than_available(spark, qry):
    tiny = spark.createDataFrame(
        pd.DataFrame({"point_id": [1, 2], "lat": [0, M], "lon": [0, M]})
    )
    got = knn_cell_ring(qry.limit(3), tiny, 5).collect()
    # only 2 points exist -> 2 ranks per query, via the fallback
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2] for v in per_q.values())


def test_knn_join_scale_shape(spark, pts):
    """kNN JOIN: the query side is the point table itself (every point
    finds its k nearest neighbours) — the shape a 100 TB all-pairs
    neighbour assignment runs. knn_cell_ring's ring certification must
    answer it exactly (vs brute force) with no reliance on the
    broadcast fallback for the bulk: assert most queries certify in
    the ring rounds."""
    k = 3
    q = pts.selectExpr("point_id AS query_id", "lat", "lon").filter(
        "query_id < 400"
    )
    want = {
        (r.query_id, r.rank): (r.point_id, r.dist2)
        for r in knn_bruteforce(q, pts, k).collect()
    }
    got = {
        (r.query_id, r.rank): (r.point_id, r.dist2)
        for r in knn_cell_ring(q, pts, k).collect()
    }
    assert got == want
    assert len({qid for qid, _ in got}) == 400
