#!/usr/bin/env python
"""Build the spark-submit artifact: dist/dagli_spark.zip.

Usage:
    python package.py
    spark-submit --py-files dist/dagli_spark.zip --master <cluster> job.py

The zip contains only the package sources (no tests/fixture caches), so
executors import the exact code the driver runs — the north rule's
"packaged for spark-submit --py-files" requirement.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build(out: str = "dist/dagli_spark.zip") -> str:
    out_path = os.path.join(REPO, out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "dagli_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = build()
    with zipfile.ZipFile(path) as z:
        n = len(z.namelist())
    print(f"built {path} ({n} modules)")
