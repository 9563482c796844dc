"""Build podcast_crawler_spark.zip for spark-submit --py-files.

Usage: python tools/package.py [out_path]   (default dist/…zip)
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "podcast_crawler_spark")
OUT = os.path.join(REPO, "dist", "podcast_crawler_spark.zip")


def main(out: str = None) -> None:
    out = out or OUT
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
    print(out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
