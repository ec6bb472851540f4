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


def _pkg_zip(tmp_path) -> str:
    zip_path = str(tmp_path / "pkg.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), zip_path],
        check=True,
        capture_output=True,
    )
    return zip_path


def _submit_env() -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return env


def _tail_cmd(zip_path: str, *job_args: str) -> list[str]:
    return [
        _spark_submit(),
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "run_tail.py"),
        *job_args,
    ]


def _cumulative_total(spark, inp: str, wd: str) -> int:
    """Sum the cumulative report straight from the work_dir partials (the
    console print is limit-bounded, so stdout can't be summed)."""
    from oplog_analyzer_spark.streaming.tail import TailStream

    return sum(
        r["count"] for r in TailStream(spark, inp, wd).report().collect()
    )


def test_spark_submit_run_tail_drain_resume_and_continuous(
    spark, transcripts, tmp_path
):
    """The reference flagship through the REAL launch path: spark-submit
    --py-files running jobs/run_tail.py for (1) an AvailableNow drain,
    (2) a resumed drain over new files — cumulative report grows to the
    batch total (T2/T8), and (3) a --continuous run drained gracefully via
    the --stop-file marker (under spark-submit the parent JVM owns the
    default SIGINT disposition and dies before the python driver can
    drain — measured exit 130 with the final batch stranded; the marker is
    the launcher-agnostic drain signal, and the SIGINT path is covered
    in-process in test_jobs.py where python IS the signalled process)
    whose final report equals the same cumulative state."""
    import time

    from oplog_analyzer_spark.operators.aggregate import ns_op_report
    from oplog_analyzer_spark.operators.filters import exclude_system_namespaces
    from oplog_analyzer_spark.operators.parse import parse_transcripts

    inp = str(tmp_path / "in")
    wd = str(tmp_path / "wd")
    transcripts.write.mode("append").parquet(inp)
    zip_path = _pkg_zip(tmp_path)
    env = _submit_env()

    def batch_total() -> int:
        parsed = exclude_system_namespaces(
            parse_transcripts(spark.read.parquet(inp), with_diff_stats=False)
        )
        return sum(r["count"] for r in ns_op_report(parsed).collect())

    # (1) first drain
    p1 = subprocess.run(
        _tail_cmd(zip_path, "--input", inp, "--work-dir", wd),
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert p1.returncode == 0, p1.stderr[-4000:]
    assert re.search(r"^ns\s+op\s+", p1.stdout, re.M), p1.stdout[-2000:]
    total1 = _cumulative_total(spark, inp, wd)
    assert total1 == batch_total() > 0

    # (2) new files arrive; the resumed drain reads ONLY the delta but the
    # cumulative report equals the full batch recompute
    from oplog_analyzer_spark import transcripts as T

    T.generate_transcripts(spark, num_conversations=40, seed=77).coalesce(
        2
    ).write.mode("append").parquet(inp)
    p2 = subprocess.run(
        _tail_cmd(zip_path, "--input", inp, "--work-dir", wd),
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert p2.returncode == 0, p2.stderr[-4000:]
    total2 = _cumulative_total(spark, inp, wd)
    assert total2 == batch_total() > total1

    # (3) continuous mode: start, feed a file while live, touch the stop
    # file → graceful drain → final report printed with the full
    # cumulative counts
    out_path = str(tmp_path / "cont_out.txt")
    stop_file = str(tmp_path / "drain.marker")
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen(
            _tail_cmd(
                zip_path, "--input", inp, "--work-dir", wd,
                "--continuous", "--processing-time", "1 second",
                "--heartbeat-sec", "2", "--stop-file", stop_file,
            ),
            cwd=str(tmp_path), env=env, stdout=out_f,
            stderr=subprocess.STDOUT, text=True,
        )
        try:
            deadline = time.monotonic() + 300
            while time.monotonic() < deadline:
                with open(out_path) as f:
                    if "tailing" in f.read():
                        break
                time.sleep(1)
            T.generate_transcripts(spark, num_conversations=20, seed=5).coalesce(
                1
            ).write.mode("append").parquet(inp)
            expected = batch_total()
            # wait for the live query to have processed EVERY input row —
            # the per-batch metrics sum the raw rows each micro-batch read,
            # and each row is read exactly once across the checkpointed
            # drains+continuous run.  (Counting new partials dirs instead
            # is racy: idle micro-batches also land (empty) batch dirs, so
            # under suite load the stop could fire before the data batch.)
            n_input_total = spark.read.parquet(inp).count()
            metrics = os.path.join(wd, "metrics")
            from pyspark.sql import functions as F

            while time.monotonic() < deadline:
                try:
                    done = (
                        spark.read.parquet(metrics)
                        .agg(F.sum("rows")).collect()[0][0] or 0
                    )
                except Exception:  # in-flight batch dir
                    done = 0
                if done >= n_input_total:
                    break
                time.sleep(1)
            time.sleep(3)  # let the last batch commit its offset
            open(stop_file, "w").close()
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
    with open(out_path) as f:
        cont_out = f.read()
    assert rc == 0, cont_out[-4000:]
    assert "graceful" in cont_out, cont_out[-2000:]
    assert re.search(r"^ns\s+op\s+", cont_out, re.M), cont_out[-2000:]
    assert _cumulative_total(spark, inp, wd) == expected


def test_spark_submit_run_dataset_hygiene_pipeline(spark, tmp_path):
    """The training-data pipeline end-to-end through REAL spark-submit with
    --py-files (the cluster launch story): dedup → quality gate → split →
    pack in one command, JSON summary on stdout, parquet output readable."""
    import json

    docs = spark.createDataFrame(
        [
            (i,
             f"the quick brown fox number {i % 10} jumps over the lazy dog "
             f"and that is plenty of words for the gate",
             "en")
            for i in range(30)
        ],
        "doc_id long, text string, lang string",
    )
    inp = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "dataset_out")

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            "--py-files", _pkg_zip(tmp_path),
            os.path.join(REPO, "jobs", "run_dataset.py"),
            "--input", inp, "--output", out,
            "--dedup", "exact", "--quality-gate",
            "--split", "train=0.8,val=0.2",
            "--pack", "64", "--pack-buckets", "2",
            "--hash", "md5",
        ],
        cwd=str(tmp_path),
        env=_submit_env(),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["rows_in"] == 30
    assert summary["rows_after_dedup"] == 10      # 10 distinct texts
    assert summary["rows_after_quality"] == 10
    written = spark.read.parquet(out)
    assert written.count() == 10
    assert {"split", "bucket", "seq_idx", "oversize"} <= set(written.columns)
