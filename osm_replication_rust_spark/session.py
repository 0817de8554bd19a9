"""SparkSession factory tuned for the tiling workload.

Local mode is a stand-in for a multi-executor cluster: every knob below is
chosen so the same plan shape survives a 1000-executor deployment (AQE for
runtime re-planning and skew-join splitting, shuffle partitions sized to the
parallelism level, Arrow for the vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm_replication_rust_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or 32. ``shuffle_partitions``
    defaults to the parallelism level — on a real cluster this would be
    ~2-3x total cores; partition *count* scales with the cluster, the
    plan does not change.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: the geometry kernels are O(rows) numpy with
        # per-batch fixed cost — 64k batches cut UDF overhead ~3-5x vs
        # the 10k default (measured in BENCH.md)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # G1 defaults collapse under 16-32 concurrent codegen tasks in one
        # JVM (measured 2.5x, BENCH.md): bigger regions + relaxed pause
        # target restore linear scaling of the allocation-heavy stages
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.timezone=UTC -XX:G1HeapRegionSize=32m -XX:MaxGCPauseMillis=400",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.timezone=UTC -XX:G1HeapRegionSize=32m -XX:MaxGCPauseMillis=400",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
