"""True ``spark-submit --py-files`` launch smoke (north_rule deployment
surface: "run via spark-submit --py-files on a multi-executor cluster").

The in-process CLI tests (test_jobs.py) prove the job logic; this one
proves the LAUNCH path: a real spark-submit subprocess, the package
shipped ONLY through the --py-files zip (cwd is a temp dir, PYTHONPATH
scrubbed), the job script addressed by absolute path — exactly how a
cluster submission looks, minus the cluster.  One subprocess JVM, kept
cheap: tiny corpus, local[2], 4 shuffle partitions.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    # prefer the launcher bundled with the installed pyspark (its jars are
    # guaranteed to match the library version the zip was built against)
    import pyspark

    bundled = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return bundled if os.path.exists(bundled) else "spark-submit"


def test_spark_submit_pyfiles_run_scan(spark, transcripts, tmp_path):
    inp = str(tmp_path / "in")
    transcripts.write.mode("overwrite").parquet(inp)

    zip_path = str(tmp_path / "pkg.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), zip_path],
        check=True,
        capture_output=True,
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_scan.py"),
            "--input", inp,
            "--ops", "i,u",
            "--min-size", "10",
        ],
        cwd=str(tmp_path),  # NOT the repo root — no accidental package import
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the A1 console report made it to stdout with only i/u ops surviving F3
    assert re.search(r"^ns\s+op\s+", proc.stdout, re.M), proc.stdout[-2000:]
    ops = set(re.findall(r"^db\d+\.coll\d+\s+(\w)\s", proc.stdout, re.M))
    assert ops and ops <= {"i", "u"}, proc.stdout[-2000:]
