"""Dump .explain('formatted') for every benched catalog query into
plans/r06/<query>_<tag>.txt  (tag = before|after, argv[1]).

Driver-side only (no actions). Usage:
    python tools/dump_plans_r06.py before [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from bench import BENCH_QUERIES
    from osm_replication_rust_spark.plans import entry_queries
    from osm_replication_rust_spark.session import get_spark

    spark = get_spark("plans-r06", cpus=4)
    catalog = entry_queries.queries()
    for name in BENCH_QUERIES:
        try:
            df = catalog[name](spark, sf_dir)
            p = plan_of(df)
        except Exception as exc:  # noqa: BLE001
            p = f"ERROR building plan: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(p)
        n_exch = p.count(") Exchange")
        n_bc = p.count("BroadcastExchange")
        n_py = p.count("EvalPython") + p.count("MapInPandas") + p.count("MapInArrow") + p.count("FlatMapGroupsInPandas")
        print(f"{name}: exchanges={n_exch} broadcast={n_bc} python_nodes={n_py} len={len(p)}")


if __name__ == "__main__":
    main()
