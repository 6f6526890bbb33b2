"""Build the --py-files archive for spark-submit deployment.

Zips the ``lyssandra_spark`` package (sources only, no __pycache__) so
executors can import it:  ``python scripts/make_pyfiles.py out.zip``.
Kept dependency-free (stdlib zipfile) and deterministic (sorted walk,
zeroed timestamps) so the same tree always produces byte-identical
archives — a re-submit with an unchanged engine ships an unchanged
artifact, which matters for cluster-side artifact caching.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str, pkg_root: str | None = None) -> str:
    if pkg_root is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(pkg_root, "lyssandra_spark")
    if not os.path.isdir(pkg):
        raise FileNotFoundError(f"package dir not found: {pkg}")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, pkg_root)
                with open(full, "rb") as f:
                    info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                    info.compress_type = zipfile.ZIP_DEFLATED
                    z.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "lyssandra_spark.zip"
    print(build(out))
