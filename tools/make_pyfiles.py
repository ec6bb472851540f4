"""Package oplog_analyzer_spark into a zip for spark-submit --py-files.

Usage:
  python tools/make_pyfiles.py [out.zip]
  spark-submit --py-files out.zip jobs/run_pipeline.py --input ... --work-dir ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "dist", "oplog_analyzer_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(repo, "oplog_analyzer_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    print(out)


if __name__ == "__main__":
    main()
