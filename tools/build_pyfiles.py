"""Build the ``--py-files`` artifact: dist/jena_spark.zip.

Deterministic (sorted entries, fixed timestamp) so repeated builds are
byte-identical and the artifact can be content-addressed by a cluster
submission service.  Usage:

    python tools/build_pyfiles.py          # → dist/jena_spark.zip
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path=None):
    out_path = out_path or os.path.join(REPO, "dist", "jena_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, "jena_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path, len(entries)


if __name__ == "__main__":
    path, n = build()
    print(f"{path}: {n} modules, {os.path.getsize(path)} bytes")
