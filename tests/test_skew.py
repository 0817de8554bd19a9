"""Salted join correctness: same result as the plain join, with the hot
key spread across salt buckets."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.operators.skew import hot_keys, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    n = 20_000
    keys = np.where(np.arange(n) % 10 < 9, 7, np.arange(n) % 100)
    big = spark.createDataFrame(
        pd.DataFrame({"cell": keys, "val": np.arange(n)})
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"cell": np.arange(100), "region": [f"r{i}" for i in range(100)]})
    )
    return big, dim


def test_salted_join_equals_plain(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, "cell").groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")
    )
    salted = salted_join(big, dim, "cell", salt_buckets=8).groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_hot_keys(spark, skewed):
    big, _ = skewed
    hot = hot_keys(big, "cell", threshold_ratio=0.5).collect()
    assert [r.cell for r in hot] == [7]
