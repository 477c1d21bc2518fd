"""Build the ``--py-files`` artifact for cluster submission.

``python tools/package_pyfiles.py [out.zip]`` zips the package (sources only,
no caches/tests) so the full invocation on a real cluster is

    spark-submit --py-files openmrs_module_epts_etl_spark.zip \
        --master yarn --deploy-mode cluster \
        your_driver.py conf.json

or, for config-driven processes, a driver that just calls
``openmrs_module_epts_etl_spark.__main__.main([...], spark=spark)``.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "openmrs_module_epts_etl_spark"


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, names in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(names):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, f"{PKG}.zip")
    n = build(out)
    print(f"wrote {out} ({n} modules)")
