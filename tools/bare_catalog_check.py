"""Run every ``queries()`` catalog entry under a BARE SparkSession —
no ``session.py`` conf, Arrow conversion at Spark defaults, default
shuffle partitions — exactly like the driver's gate environment.

This exists to kill the env-coupling bug class (round-3 verdict): a
gate query that only works because the engine's session sets
``spark.sql.execution.arrow.pyspark.enabled=true`` (masking e.g. the
pandas int->float coercion on nullable-int columns) must fail HERE, in
CI, not in the driver.

Usage: python tools/bare_catalog_check.py [sf_dir] [query_name ...]
Exit 0 iff every query executes and returns a well-formed result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # deliberately bare: master/app name only, nothing from session.py
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("bare-catalog-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            _ = df.schema  # force analysis
            print(f"ok   {name}: {n} rows in {time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report every failure kind
            msg = f"{type(e).__name__}: {e}"
            failures[name] = msg.splitlines()[0][:300]
            print(f"FAIL {name}: {failures[name]}", flush=True)
    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
