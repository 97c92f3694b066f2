"""Build the --py-files zip for spark-submit and print its path.

The north rule requires the pipeline to run via
``spark-submit --py-files``; this packages the engine (and the driver
contract module) into one zip:

  spark-submit --py-files $(python tools/make_pyfiles.py) bench.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "rasters_rs_spark.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(os.path.join(REPO, "rasters_rs_spark")):
            if "__pycache__" in base:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(base, fn)
                    zf.write(full, os.path.relpath(full, REPO))
        zf.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return OUT


if __name__ == "__main__":
    print(main())
