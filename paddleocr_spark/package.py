"""Build dist/paddleocr_spark.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import os
import zipfile


def build(out: str = "dist/paddleocr_spark.zip") -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out_path = os.path.join(root, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    rel = os.path.relpath(full, root)
                    zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
