#!/bin/sh
# Build the --py-files artifact for spark-submit (north rule packaging).
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/osmquadtree_bin_spark.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/osmquadtree_bin_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("osmquadtree_bin_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/osmquadtree_bin_spark.zip")
PY
