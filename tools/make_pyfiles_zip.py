"""Build the --py-files archive for cluster submission.

The north-rule deployment shape is ``spark-submit --py-files
lucille_spark.zip jobs/<job>.py`` on a multi-executor cluster: the driver
runs the job script, every executor imports the package from the shipped
zip. This packages exactly the importable package (no tests, no caches,
no artifacts) deterministically — fixed timestamps and sorted entries, so
re-running on an unchanged tree produces a byte-identical archive (useful
for content-addressed deploy caches).

    python tools/make_pyfiles_zip.py [out.zip]   # default lucille_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "lucille_spark"
# fixed DOS timestamp (2020-01-01) -> deterministic archive bytes
_STAMP = (2020, 1, 1, 0, 0, 0)


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        entries = []
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname, date_time=_STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
            n += 1
    return n


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "lucille_spark.zip")
    n = build(out)
    size = os.path.getsize(out)
    print(f"{out}: {n} files, {size} bytes")


if __name__ == "__main__":
    main()
