"""Build the ``--py-files`` zip for cluster submission ([B] north_rule:
"packaged for spark-submit --py-files").

    python jobs/package.py [--out dist/abs_log_spark.zip]
    spark-submit --py-files dist/abs_log_spark.zip jobs/run_pipeline.py ...
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pkg_root = os.path.join(REPO, "abs_log_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "abs_log_spark.zip"))
    args = ap.parse_args()
    print(build_zip(args.out))
    return 0


if __name__ == "__main__":
    main()
