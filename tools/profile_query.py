"""Per-stage wall-time attribution for one catalog query (guide §1).

Runs <query> with the noop sink N times on local[$SPARK_GRAFT_CPUS] with
the Spark event log enabled, then parses the event log into a per-stage
table: stage name/callsite, task count, total task time, max task time,
and the wall span of the stage. Isolation-only — bench.py stays the
measurement of record.

Usage: python tools/profile_query.py <query> [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    log_dir = f"/tmp/sparklogs_{name}_{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)

    from osm_replication_rust_spark.plans import entry_queries
    from osm_replication_rust_spark.session import get_spark

    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    catalog = entry_queries.queries()
    walls = []
    for i in range(repeats):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        catalog[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    print(f"query={name} sf={sf_dir} walls={walls}")
    # parse the event log (Spark 4: eventlog_v2_<appid>/ dir of events_* files)
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        path = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(path):
        import glob as _glob
        files = sorted(_glob.glob(os.path.join(path, "events_*")))
    else:
        files = [path]
    stages = {}  # (stageId, attempt) -> info
    for fname in files:
      with open(fname) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                sub = si.get("Submission Time", 0)
                comp = si.get("Completion Time", 0)
                stages.setdefault(key, {}).update(
                    name=si["Stage Name"],
                    tasks=si["Number of Tasks"],
                    wall=(comp - sub) / 1000.0,
                )
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                info = stages.setdefault(key, {})
                tm = ev.get("Task Metrics") or {}
                info["task_ms"] = info.get("task_ms", 0) + tm.get("Executor Run Time", 0)
                info["task_max_ms"] = max(info.get("task_max_ms", 0), tm.get("Executor Run Time", 0))
                info["gc_ms"] = info.get("gc_ms", 0) + tm.get("JVM GC Time", 0)
                info["py_ms"] = info.get("py_ms", 0) + tm.get("Executor Deserialize Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                info["sh_read_b"] = info.get("sh_read_b", 0) + sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                info["fetch_ms"] = info.get("fetch_ms", 0) + sr.get("Fetch Wait Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                info["sh_write_b"] = info.get("sh_write_b", 0) + sw.get("Shuffle Bytes Written", 0)

    rows = sorted(stages.items(), key=lambda kv: -(kv[1].get("wall") or 0))
    print(f"{'stage':>6} {'wall_s':>7} {'tasks':>5} {'tsum_s':>7} {'tmax_s':>6} {'gc_s':>5} {'shR_MB':>7} {'shW_MB':>7}  name")
    for (sid, att), info in rows[:25]:
        print(
            f"{sid:>6} {info.get('wall', 0):>7.2f} {info.get('tasks', 0):>5} "
            f"{info.get('task_ms', 0)/1000:>7.2f} {info.get('task_max_ms', 0)/1000:>6.2f} "
            f"{info.get('gc_ms', 0)/1000:>5.2f} "
            f"{info.get('sh_read_b', 0)/1e6:>7.1f} {info.get('sh_write_b', 0)/1e6:>7.1f}  "
            f"{(info.get('name') or '?')[:90]}"
        )


if __name__ == "__main__":
    main()
