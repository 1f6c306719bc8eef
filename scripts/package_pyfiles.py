"""Build the spark-submit ``--py-files`` artifact: one zip of the
pure-Python ``biomedical_ner_spark`` package (no binary deps, so a single
zip ships to every executor's PYTHONPATH).

Usage:
    python scripts/package_pyfiles.py [dist/biomedical_ner_spark.zip]
    spark-submit --py-files dist/biomedical_ner_spark.zip \
        scripts/kg_job.py --input <repo-table-or-synth:N> --output /path

The artifact contains only .py files of the package (SURVEY.md §7 design
stance: one package, spark-submit --py-files).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "biomedical_ner_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/biomedical_ner_spark.zip"
    print(build(out))
