"""Build the --py-files artifact for cluster submission (north rule:
"deployed with spark-submit --py-files on multi-executor clusters").

Produces dist/feature_extractor_spark.zip containing the package only (no
tests, no tools, no caches). Executors import the package from the zip via
zipimport — everything in the package is pure Python + NumPy, so no native
build step is needed.

Usage:
    python tools/make_pyfiles.py [--out dist/feature_extractor_spark.zip]
    spark-submit --master <cluster> \
        --py-files dist/feature_extractor_spark.zip \
        tools/submit_example.py --input ... --output ...
"""

from __future__ import annotations

import argparse
import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "feature_extractor_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    src_root = os.path.join(ROOT, PACKAGE)
    n = 0
    # deterministic archive: sorted walk, zeroed timestamps
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(src_root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, ROOT)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.external_attr = 0o644 << 16
                with open(full, "rb") as f:
                    zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
                n += 1
    return f"{out_path}: {n} modules"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(ROOT, "dist", "feature_extractor_spark.zip"))
    args = p.parse_args()
    print(build(args.out))


if __name__ == "__main__":
    main()
