"""Build dist/tilemaker_spark.zip for spark-submit --py-files.

Pure stdlib (zipfile) so it runs anywhere the repo does; the zip
contains the ``tilemaker_spark`` package at its root, which is exactly
what --py-files prepends to every executor's sys.path.

    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files dist/tilemaker_spark.zip jobs/build_tiles_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "tilemaker_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "tilemaker_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
