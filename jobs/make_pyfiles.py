"""Build the ``--py-files`` archive for cluster submission (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

The package is pure Python — every format preset, SRS series, and codec is
embedded as code/data, so the zip alone makes executors fully functional
(no repo checkout, no native libs). Prints the zip path.

Usage::

    ZIP=$(python jobs/make_pyfiles.py)
    spark-submit --master <cluster> --py-files "$ZIP" jobs/pipeline_job.py ...
"""

from __future__ import annotations

import os
import zipfile


def build(dst: str = "/tmp/gdalcubes_cpp_spark_pyfiles.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "gdalcubes_cpp_spark")
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return dst


if __name__ == "__main__":
    print(build())
