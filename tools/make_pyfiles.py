"""Build the ``--py-files`` artifact for spark-submit deployment.

The north rule's deployment story is ``spark-submit --py-files`` on a
multi-executor cluster: the whole engine ships as ONE zip that every
executor's python worker can import, with no repo checkout on the
workers.  This builds that zip deterministically (sorted entries, fixed
timestamps, .py only) so repeated builds are byte-identical and a
cluster cache never sees a spurious artifact change.

Usage: python tools/make_pyfiles.py [out_zip]
       (default: dist/osm_replication_rust_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "osm_replication_rust_spark"
# fixed timestamp for deterministic zips (zipfile's DOS-time floor)
_STAMP = (1980, 1, 1, 0, 0, 0)


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", f"{PACKAGE}.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg_root = os.path.join(REPO, PACKAGE)
    names = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                names.append((os.path.relpath(full, REPO), full))
    tmp = out_zip + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(names):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=_STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    os.replace(tmp, out_zip)  # atomic publish, like the table manifests
    return out_zip


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
