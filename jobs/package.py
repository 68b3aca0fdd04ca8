#!/usr/bin/env python
"""Zip the admarus_spark package for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("ADMARUS_PKG_OUT", os.path.join(ROOT, "admarus_spark.zip"))


def main() -> None:
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "admarus_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, ROOT))
    print(OUT)


if __name__ == "__main__":
    main()
