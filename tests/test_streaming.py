"""Streaming tail analog: incremental drain equals batch recompute, and new
files arriving between runs are picked up exactly once (resume via stream
checkpoint — the T8 extension the reference lacks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oplog_analyzer_spark import transcripts as T
from oplog_analyzer_spark.operators.aggregate import ns_op_report
from oplog_analyzer_spark.operators.filters import exclude_system_namespaces
from oplog_analyzer_spark.operators.parse import parse_transcripts
from oplog_analyzer_spark.streaming.tail import TailStream


def _expected_report(spark, input_dir):
    df = spark.read.parquet(input_dir)
    parsed = exclude_system_namespaces(parse_transcripts(df, with_diff_stats=False))
    return {
        (r["ns"], r["op"]): (r["count"], r["total_size"], r["min_size"], r["max_size"], r["avg_size"])
        for r in ns_op_report(parsed).collect()
    }


def test_tail_incremental_equals_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    first = T.generate_transcripts(spark, num_conversations=60, seed=42)
    first.coalesce(2).write.mode("append").parquet(input_dir)

    tail = TailStream(spark, input_dir, str(tmp_path / "wd"))
    tail.run_available()
    got1 = {
        (r["ns"], r["op"]): (r["count"], r["total_size"], r["min_size"], r["max_size"], r["avg_size"])
        for r in tail.report().collect()
    }
    assert got1 == _expected_report(spark, input_dir)

    # new data arrives (different seed → different rows); second drain must
    # consume ONLY the new files (checkpointed offsets) yet the cumulative
    # report equals a full batch recompute
    more = T.generate_transcripts(spark, num_conversations=40, seed=99)
    more.coalesce(2).write.mode("append").parquet(input_dir)
    tail.run_available()
    got2 = {
        (r["ns"], r["op"]): (r["count"], r["total_size"], r["min_size"], r["max_size"], r["avg_size"])
        for r in tail.report().collect()
    }
    assert got2 == _expected_report(spark, input_dir)
    assert sum(v[0] for v in got2.values()) > sum(v[0] for v in got1.values())

    # heartbeat metrics recorded per micro-batch (T3)
    m = spark.read.parquet(tail.metrics_dir)
    assert m.count() >= 2
    assert m.agg(F.sum("rows")).collect()[0][0] == spark.read.parquet(input_dir).count()


def test_tail_replayed_batch_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a micro-batch with the
    same batch_id (crash between sink write and offset commit) must leave
    the cumulative report and heartbeat metrics unchanged."""
    input_dir = str(tmp_path / "in3")
    T.generate_transcripts(spark, num_conversations=30).coalesce(1).write.parquet(input_dir)
    tail = TailStream(spark, input_dir, str(tmp_path / "wd3"))
    batch = spark.read.parquet(input_dir)

    tail._sink_batch(batch, 0)
    once = sorted(map(tuple, tail.report().collect()))
    rows_once = spark.read.parquet(tail.metrics_dir).agg(F.sum("rows")).collect()[0][0]

    tail._sink_batch(batch, 0)  # replay
    twice = sorted(map(tuple, tail.report().collect()))
    rows_twice = spark.read.parquet(tail.metrics_dir).agg(F.sum("rows")).collect()[0][0]
    assert once == twice
    assert rows_once == rows_twice


def test_tail_lag_metric(spark, tmp_path):
    input_dir = str(tmp_path / "in2")
    T.generate_transcripts(spark, num_conversations=10).coalesce(1).write.parquet(input_dir)
    tail = TailStream(spark, input_dir, str(tmp_path / "wd2"))
    tail.run_available()
    lag = tail.lag_seconds("2025-06-01 00:00:00").collect()[0]["lag_sec"]
    assert lag > 0
    # wallclock before every event → clamped to 0 (TailCommand.java:1073)
    lag0 = tail.lag_seconds("2020-01-01 00:00:00").collect()[0]["lag_sec"]
    assert lag0 == 0


def test_stateful_accumulator_equals_batch_and_resumes(spark, tmp_path):
    """T6 via applyInPandasWithState: the per-(ns,op) accumulator lives as
    operator state in the stream checkpoint; a later drain RESUMES it (T8)
    and the cumulative report equals a full batch recompute."""
    input_dir = str(tmp_path / "in4")
    T.generate_transcripts(spark, num_conversations=50, seed=1).coalesce(2).write.mode(
        "append"
    ).parquet(input_dir)
    tail = TailStream(spark, input_dir, str(tmp_path / "wd4"))
    tail.run_stateful_available()
    got1 = {
        (r["ns"], r["op"]): (r["count"], r["total_size"], r["min_size"],
                             r["max_size"], r["avg_size"])
        for r in tail.stateful_report().collect()
    }
    assert got1 == _expected_report(spark, input_dir)

    # more data arrives; the drain resumes the SAME state (not re-reading
    # old files) yet the cumulative report matches the full recompute
    T.generate_transcripts(spark, num_conversations=30, seed=9).coalesce(2).write.mode(
        "append"
    ).parquet(input_dir)
    tail.run_stateful_available()
    got2 = {
        (r["ns"], r["op"]): (r["count"], r["total_size"], r["min_size"],
                             r["max_size"], r["avg_size"])
        for r in tail.stateful_report().collect()
    }
    assert got2 == _expected_report(spark, input_dir)
    assert sum(v[0] for v in got2.values()) > sum(v[0] for v in got1.values())


def test_tail_threshold_buckets_incremental(spark, tmp_path):
    """A3 buckets in tail mode (the reference's --thresholdBuckets on the
    tail command): bucket counters accumulate through the per-batch
    partials and the cumulative counts equal a batch recompute over both
    drains' input."""
    input_dir = str(tmp_path / "in_b")
    T.generate_transcripts(spark, num_conversations=50, seed=7).coalesce(
        2
    ).write.mode("append").parquet(input_dir)

    tail = TailStream(spark, input_dir, str(tmp_path / "wd_b"), buckets=(90, 120))
    tail.run_available()
    T.generate_transcripts(spark, num_conversations=30, seed=8).coalesce(
        2
    ).write.mode("append").parquet(input_dir)
    tail.run_available()

    got = {
        (r["ns"], r["op"]): (r["count"], r["gt_90"], r["gt_120"])
        for r in tail.report().collect()
    }
    batch = exclude_system_namespaces(
        parse_transcripts(spark.read.parquet(input_dir), with_diff_stats=False)
    )
    want = {
        (r["ns"], r["op"]): (r["count"], r["gt_90"], r["gt_120"])
        for r in ns_op_report(batch, buckets=(90, 120)).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in got.values())  # buckets non-vacuous
