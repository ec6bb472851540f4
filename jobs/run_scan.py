"""spark-submit entry point: bounded scan → accumulator report.

The `scan` command analog (ScanCommand.java:236-294 server-side ts-range
query + per-(ns,op) accumulator report): read a transcript/oplog-shaped
parquet dir, apply the optional ts range and filter family, print the A1
report.

  spark-submit --py-files dist/oplog_analyzer_spark.zip jobs/run_scan.py \
    --input <dir> [--start "2025-01-01 00:00:00"] [--end ...] \
    [--ns a.b,c.d] [--ops i,u] [--min-size N] [--max-size N] [--limit N]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--start")
    ap.add_argument("--end")
    ap.add_argument("--ns", help="comma-separated namespace include-list (F2)")
    ap.add_argument("--ops", help="comma-separated op include-list (F3)")
    ap.add_argument("--min-size", type=int)
    ap.add_argument("--max-size", type=int)
    ap.add_argument("--limit", type=int, help="row limit (F7)")
    ap.add_argument("--buckets", help="comma-separated size thresholds (A3)")
    ap.add_argument(
        "--style", choices=("plain", "reference"), default="plain",
        help="report layout: 'reference' renders the byte-exact "
        "EntryAccumulator table (EntryAccumulator.java:77-177)",
    )
    ap.add_argument(
        "--unwind-mode", choices=("parity", "routed"), default="parity",
        help="applyOps unwind semantics: 'parity' replicates the reference "
        "(parent $cmd entry accumulated ALONGSIDE inner ops, only *.$cmd "
        "namespaces unwind, system namespaces re-excluded after the unwind "
        "— TailCommand.java:637-668); 'routed' emits each logical op "
        "exactly once (any sub-marked command unwinds, parent replaced) — "
        "the routed-row-equality form the pipeline uses",
    )
    args = ap.parse_args()

    from oplog_analyzer_spark.operators import filters as FL
    from oplog_analyzer_spark.operators.aggregate import ns_op_report
    from oplog_analyzer_spark.operators.display import console_report
    from oplog_analyzer_spark.operators.parse import parse_transcripts, unwind_applyops
    from oplog_analyzer_spark.session import get_spark
    from oplog_analyzer_spark.sources.tables import time_range_scan

    spark = get_spark(master=None, app_name="oplog-scan")
    df = spark.read.parquet(args.input)
    df = time_range_scan(df, "ts", args.start, args.end)
    parity = args.unwind_mode == "parity"
    df = unwind_applyops(
        FL.exclude_system_namespaces(parse_transcripts(df)),
        keep_parent=parity, only_cmd_ns=parity,
    )
    if parity:
        # inner applyOps namespaces can be system ns too — the reference
        # filters them AFTER the unwind (TailCommand.java:637-668)
        df = FL.exclude_system_namespaces(df)
    if args.ns:
        df = FL.include_namespaces(df, args.ns.split(","))
    if args.ops:
        df = FL.include_ops(df, args.ops.split(","))
    df = FL.size_range(df, args.min_size, args.max_size)
    df = FL.row_limit(df, args.limit)
    buckets = tuple(int(b) for b in args.buckets.split(",")) if args.buckets else ()
    print(console_report(
        ns_op_report(df, buckets=buckets), limit=50,
        style=args.style, buckets=buckets,
    ))


if __name__ == "__main__":
    main()
