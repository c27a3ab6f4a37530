"""Package searchengine_spark into dist/searchengine_spark.zip for
``spark-submit --py-files`` (the north-rule deploy contract).

Usage: python tools/make_pyfiles.py [outdir]
Prints the zip path.
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(outdir=None) -> str:
    outdir = outdir or os.path.join(REPO, "dist")
    os.makedirs(outdir, exist_ok=True)
    zpath = os.path.join(outdir, "searchengine_spark.zip")
    pkg = os.path.join(REPO, "searchengine_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith((".py", ".txt")):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else None))
