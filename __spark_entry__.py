"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query: the cell-prefilter spatial
join assigning geo-footprinted rows to the fixture region hierarchy
(the engine's re-expression of the reference's polygon extract,
/root/reference/src/osmxml/filter.rs + /root/reference/src/diffs.rs).

``queries()`` / ``oracle_sql()`` pair every SQL-expressible operator
with a DuckDB oracle over the same parquet tables. Spark expressions
and SQL strings are generated from the same definitions in
``osm_replication_rust_spark.functions.coords`` wherever arithmetic
must match bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from osm_replication_rust_spark.plans import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile-assign sf0.001 events (with derived decimicro
    footprints) to the fixture multipolygon region hierarchy."""
    return entry_queries.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
