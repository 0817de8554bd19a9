"""as-of join + sessionization vs hand-computed expectations."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_replication_rust_spark.operators.relational import asof_join, sessionize


def ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_asof_backward(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "ts": [ts(5), ts(10), ts(1), ts(7)], "lv": list("abcd")})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [ts(3), ts(10), ts(9)], "rv": [30, 100, 90]})
    )
    out = {
        (r.k, r.ts.minute): r.right_rv
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    assert out[(1, 5)] == 30     # latest at-or-before 0:05 is 0:03
    assert out[(1, 10)] == 100   # exact-ts right row matches
    assert out[(1, 1)] is None   # nothing before 0:01
    assert out[(2, 7)] is None   # right row is after


def test_sessionize(spark):
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1] * 5 + [2] * 2,
                "ts": [ts(0), ts(1), ts(40), ts(41), ts(100), ts(0), ts(59)],
                "eid": range(7),
            }
        )
    )
    out = {r.eid: r.session_id for r in sessionize(ev, "k", "ts", gap_seconds=1800).collect()}
    assert [out[i] for i in range(5)] == [1, 1, 2, 2, 3]
    assert out[5] == 1 and out[6] == 2  # 59-min gap for key 2
