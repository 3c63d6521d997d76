"""Build ``dist/pxs.zip`` — the ``spark-submit --py-files`` artifact.

The north-star deployment shape is

    spark-submit --py-files dist/pxs.zip run_job.py rollup ...

where every executor's Python worker imports ``peakmatch_xcorr_spark``
from the zip (Spark prepends --py-files archives to the worker's
``sys.path``; CPython imports from zips natively via zipimport).  The
package is deliberately zip-safe: no ``__file__``-relative data reads,
no package data files — only ``.py`` sources.

The archive is deterministic (sorted entries, fixed timestamps) so the
same tree always hashes to the same artifact, which lets a deploy
pipeline skip re-shipping an unchanged build.

Usage:  python tools/package.py [out.zip]
"""
from __future__ import annotations

import os
import sys
import zipfile

# Fixed DOS timestamp (2020-01-01 00:00:00) for reproducible archives.
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build(out: str = "dist/pxs.zip", root: str | None = None) -> str:
    """Zip peakmatch_xcorr_spark/**/*.py into ``out``; return its path."""
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "peakmatch_xcorr_spark")
    if not os.path.isdir(pkg):
        raise FileNotFoundError(pkg)
    out_dir = os.path.dirname(os.path.abspath(out))
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + ".tmp"
    n = 0
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root).replace(os.sep, "/")
                info = zipfile.ZipInfo(rel, date_time=_EPOCH)
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16
                with open(full, "rb") as f:
                    z.writestr(info, f.read())
                n += 1
    os.replace(tmp, out)
    print(f"wrote {out} ({n} modules)")
    return out


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "dist/pxs.zip")
