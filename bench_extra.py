"""Secondary (non-headline) benchmarks — NOT part of the driver
contract; `bench.py` is the frozen measurement of record.

Times the gate-only heavyweight queries (the fattest catalog rows that
bench.py does not carry) with the noop sink, min-of-N, so a blowup in
one of them is visible round over round. Prints ONE JSON line.

Usage:
    python bench_extra.py [query ...]       # default: the heavyweight set
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_PASSES (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: the fattest non-benched gate rows (r6 profile: 2-16 s at sf0.1)
EXTRA_QUERIES = [
    "way_geometry",
    "raster_vectorize",
    "multimodal_decode_stats",
    "pretrain_filter_pipeline",
    "sessionize",
    "session_window_stats",
    "image_ahash",
    "embedding_near_dup",
]


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or EXTRA_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    from osm_replication_rust_spark.plans import entry_queries
    from osm_replication_rust_spark.session import get_spark

    spark = get_spark("bench-extra", cpus=cpus)
    catalog = entry_queries.queries()
    best: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra {name}")
            t0 = time.time()
            catalog[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(best[name], time.time() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "metric": "gate-only heavyweight wall times (noop sink)",
                "unit": "sec",
                "queries": {n: round(t, 3) for n, t in best.items()},
                "sf": sf_dir,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
