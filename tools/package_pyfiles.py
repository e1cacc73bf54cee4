"""Build the --py-files zip for cluster submission.

Usage:
    python tools/package_pyfiles.py            # -> dist/ai_intel_web_scraper_spark.zip
    spark-submit --py-files dist/ai_intel_web_scraper_spark.zip \
        --master <cluster> your_job.py

The zip contains the pure-Python package only (no tests/fixtures); every
executor-side dependency (numpy, pandas, pyarrow) ships with standard
PySpark images.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ai_intel_web_scraper_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = os.path.join(ROOT, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
