"""Table loaders + format dispatch.

The reference routes inputs by file extension
(/root/reference/src/osm.rs:262-279 `import`, :292-310 `update`); here
that's a thin format-dispatch in front of ``spark.read`` — parquet by
default, Iceberg when the catalog jars are present (import-gated).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched scan (the engine's P7)."""
    low = path.lower()
    if low.endswith(".parquet") or os.path.isdir(path):
        return spark.read.parquet(path)
    if low.endswith(".json") or low.endswith(".json.gz"):
        return spark.read.json(path)
    if low.endswith(".csv") or low.endswith(".csv.gz"):
        return spark.read.option("header", "true").csv(path)
    if low.endswith(".orc"):
        return spark.read.orc(path)
    raise ValueError(f"unsupported source format: {path}")


def star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The driver-generated star schema as named DataFrames, also
    registered as temp views (so spark.sql can be used 1:1 against the
    DuckDB oracle)."""
    out = {}
    for t in STAR_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            df = spark.read.parquet(p)
            df.createOrReplaceTempView(t)
            out[t] = df
    return out


def try_iceberg(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session. The
    TableStore falls back to parquet snapshots otherwise (same MERGE
    plan shape either way)."""
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS spark_catalog.default")
        return True
    except Exception:  # noqa: BLE001
        return False
