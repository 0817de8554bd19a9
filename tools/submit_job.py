"""spark-submit entrypoint: the flagship tiling job as a cluster would
run it.

    spark-submit --master <master> \
        --py-files dist/osm_replication_rust_spark.zip \
        tools/submit_job.py <sf_dir> [query ...]

Imports the engine ONLY from ``--py-files`` (this script deliberately
lives outside the package and adds nothing to sys.path), attaches to
the session spark-submit configured, runs the flagship spatial-join +
tiling query — plus any extra catalog queries named on the command
line — and prints one JSON line per query: name, rows, seconds.
"""

from __future__ import annotations

import json
import sys
import time


def main(argv: list[str]) -> int:
    if not argv:
        print("usage: submit_job.py <sf_dir> [query ...]", file=sys.stderr)
        return 2
    sf_dir, extra = argv[0], argv[1:]

    # the engine must come from --py-files, not a checkout
    from pyspark.sql import SparkSession

    from osm_replication_rust_spark.plans import entry_queries

    spark = SparkSession.builder.appName("osm-replication-spark-submit").getOrCreate()
    catalog = entry_queries.queries()
    names = ["flagship", *extra]
    rc = 0
    for name in names:
        fn = catalog.get(name) or getattr(entry_queries, name, None)
        if fn is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            rc = 1
            continue
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        print(
            json.dumps(
                {"query": name, "rows": n, "sec": round(time.monotonic() - t0, 3)}
            )
        )
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
