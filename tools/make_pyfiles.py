"""Package the engine for spark-submit --py-files (north_rule submission).

Builds dist/clj_nlp_parse_spark.zip containing the package; submit with:

  spark-submit --py-files dist/clj_nlp_parse_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      your_job.py

The engine has no data files outside the package (rule tables are code),
so the zip is self-contained.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = None) -> str:
    out = out or os.path.join(ROOT, "dist", "clj_nlp_parse_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "clj_nlp_parse_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
