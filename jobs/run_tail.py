"""spark-submit entry point: incremental tail of a growing transcript dir.

The `tail` command analog (TailCommand.java:534-773): drain everything
currently available (Trigger.AvailableNow), maintain the cumulative
per-(ns,op) accumulator across drains via the stream checkpoint, print the
report.  Re-running resumes exactly (T8 — the extension the reference
lacks).

  spark-submit --py-files dist/oplog_analyzer_spark.zip jobs/run_tail.py \
    --input <dir> --work-dir <dir> [--stateful] [--lag-wallclock "ts"]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--stateful", action="store_true",
                    help="maintain the accumulator as applyInPandasWithState "
                         "operator state instead of merge-safe partials")
    ap.add_argument("--lag-wallclock", help="report lag vs this wallclock (P8/T4)")
    ap.add_argument(
        "--buckets",
        help="comma-separated size thresholds added to the cumulative "
        "accumulator (A3, the reference's --thresholdBuckets in tail "
        "mode); part of the partials schema — keep it constant across "
        "resumes of one work-dir",
    )
    args = ap.parse_args()

    from oplog_analyzer_spark.operators.display import console_report
    from oplog_analyzer_spark.session import get_spark
    from oplog_analyzer_spark.streaming.tail import TailStream

    spark = get_spark(master=None, app_name="oplog-tail")
    buckets = tuple(int(b) for b in args.buckets.split(",")) if args.buckets else ()
    tail = TailStream(spark, args.input, args.work_dir, buckets=buckets)
    if args.stateful:
        tail.run_stateful_available()
        print(console_report(tail.stateful_report()))
    else:
        tail.run_available()
        print(console_report(tail.report()))
    if args.lag_wallclock:
        print(console_report(tail.lag_seconds(args.lag_wallclock)))


if __name__ == "__main__":
    main()
