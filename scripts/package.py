#!/usr/bin/env python
"""Build dist/osgeo_gdal_spark.zip for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.makedirs(f"{ROOT}/dist", exist_ok=True)
    out = f"{ROOT}/dist/osgeo_gdal_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = f"{ROOT}/osgeo_gdal_spark"
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
