"""Two-parallelism scaling evidence (BASELINE.json north_rule: N->4N
executor throughput scaling efficiency >= 0.8; in this sandbox the two
"cluster sizes" are two local[...] levels on the same input).

The sandbox host is SHARED with bursty external tenants (load >10 with
none of our processes running), which falsifies naive wall-clock
comparison. This harness therefore gates every measurement on a
quiet-host check: it samples /proc/stat while idle and only launches a
run when external busy < QUIET_CORES; attempts bracketed by a noisy
pre/post sample are discarded. Levels alternate; best accepted run per
level wins.

Usage: python tools/bench_scaling.py [rows] [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUIET_CORES = 2.5
MAX_WAIT_S = 2400
NEEDED_PER_LEVEL = 2

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_sample():
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return sum(vals), vals[3] + vals[4]  # total, idle(+iowait)


def external_busy_cores(window: float = 2.0) -> float:
    t0, i0 = cpu_sample()
    time.sleep(window)
    t1, i1 = cpu_sample()
    dt, di = t1 - t0, i1 - i0
    ncpu = os.cpu_count() or 32
    return (1 - di / dt) * ncpu if dt else 0.0


def run_level(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, "bench.py", "--tiling-only", "--rows", str(rows)],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=2400,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo

    accepted: dict[int, list[dict]] = {lo: [], hi: []}
    t_start = time.time()
    turn = 0
    while time.time() - t_start < MAX_WAIT_S and (
        len(accepted[lo]) < NEEDED_PER_LEVEL or len(accepted[hi]) < NEEDED_PER_LEVEL
    ):
        pre = external_busy_cores()
        if pre > QUIET_CORES:
            print(f"host noisy (ext busy={pre:.1f} cores) — waiting", flush=True)
            time.sleep(20)
            continue
        cpus = (lo, hi)[turn % 2]
        turn += 1
        if len(accepted[cpus]) >= NEEDED_PER_LEVEL:
            cpus = lo if cpus == hi else hi
        r = run_level(cpus, rows)
        post = external_busy_cores()
        if post > QUIET_CORES:
            print(f"discarding {cpus}-core run (post ext busy={post:.1f})", flush=True)
            continue
        print(
            f"accepted {cpus}-core run: {r['queries']['tiling_flagship']}s "
            f"({r['images_per_sec']:,}/s) pre={pre:.1f} post={post:.1f}",
            flush=True,
        )
        accepted[cpus].append(r)

    if not accepted[lo] or not accepted[hi]:
        print("FAILED: no quiet window for one of the levels")
        sys.exit(1)
    r_lo = max(accepted[lo], key=lambda r: r["images_per_sec"])
    r_hi = max(accepted[hi], key=lambda r: r["images_per_sec"])
    thr_lo, thr_hi = r_lo["images_per_sec"], r_hi["images_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    stamp = time.strftime("%Y-%m-%d %H:%M:%SZ", time.gmtime())
    report = f"""## Scaling evidence ({stamp})

Same tiling job (cell-prefilter spatial join, {rows:,} synthetic
geo-tagged rows, expression-compiled refine, warm JVM) at two
parallelism levels; every accepted run was bracketed by quiet-host
checks (external busy < {QUIET_CORES} cores before and after):

| level | cores | wall (s) | images/sec | accepted runs |
|---|---|---|---|---|
| N  | {lo} | {r_lo['queries']['tiling_flagship']} | {thr_lo:,} | {len(accepted[lo])} |
| 4N | {hi} | {r_hi['queries']['tiling_flagship']} | {thr_hi:,} | {len(accepted[hi])} |

Scaling efficiency (N->4N) = (thr_4N / thr_N) / {hi // lo} = **{eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule).
"""
    print(report)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n" + report)


if __name__ == "__main__":
    main()
