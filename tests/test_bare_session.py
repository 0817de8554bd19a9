"""Env-coupling killer (round-3 verdict item 2): every ``queries()``
catalog entry must execute under a BARE SparkSession — no engine conf
from ``session.py``, Arrow conversion at Spark defaults, 200 shuffle
partitions — because that is the environment the driver's correctness
gate runs in.  Round 3's only red row (``osc_roundtrip``) was exactly
this class: a pandas int->float coercion masked by the engine session's
Arrow conversion.

Runs in a subprocess so the bare JVM/session cannot inherit conf from
the pytest session fixture.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_catalog_runs_under_bare_session(sf_dir):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bare_catalog_check.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    assert proc.returncode == 0, f"bare-session catalog check failed:\n{tail}"
