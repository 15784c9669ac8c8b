"""Build dist/ptt_spider_go_spark.zip for spark-submit --py-files.

The north_rule runs the engine "via spark-submit --py-files on a
multi-executor cluster"; this packages the pure-Python library (no
tests, no caches) into a zip that Spark ships to every executor and
that zipimport resolves directly.

Usage:  python tools/make_pyfiles_zip.py [out_dir]
Prints the zip path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "ptt_spider_go_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, f"{PACKAGE}.zip")
    src_root = os.path.join(REPO, PACKAGE)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zip_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
