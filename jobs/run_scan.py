"""spark-submit entry point: bounded scan → accumulator report.

The `scan` command analog (ScanCommand.java:236-294 server-side ts-range
query + per-(ns,op) accumulator report): read a transcript/oplog-shaped
parquet dir, apply the optional ts range and filter family, print the A1
report.

  spark-submit --py-files dist/oplog_analyzer_spark.zip jobs/run_scan.py \
    --input <dir> [--start "2025-01-01 00:00:00"] [--end ...] \
    [--ns a.b,c.d] [--ops i,u] [--min-size N] [--max-size N] [--limit N] \
    [--threshold N [--full-rows N]] [--shard-index 0,2] [--shard-stats] \
    [--id-stats [--id-stats-threshold N] [--top-ids K]] \
    [--dump <dir> [--dump-with-shard]]
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
        "--threshold", type=int,
        help="F5: side-output report of ops >= this size (the reference's "
        "-t/--threshold log, BaseOplogCommand.java:124-127) — flagged rows "
        "stay in the main aggregation",
    )
    ap.add_argument(
        "--shard-index",
        help="F8: comma-separated positions in the SORTED distinct shard "
        "list (TailCommand.java:966-989), e.g. 0,2",
    )
    ap.add_argument(
        "--shards", type=int, default=4,
        help="synthesize shard = xxhash(conv_id) %% N when the input has "
        "no shard column",
    )
    ap.add_argument(
        "--id-stats", action="store_true",
        help="A5/A6: per-id statistics + top-id report (--idStats)",
    )
    ap.add_argument(
        "--id-stats-threshold", type=int, default=0,
        help="F6: only rows >= this size enter id statistics "
        "(IdStatisticsManager.java:70-72; independent of --threshold — "
        "the two-threshold system, reference README.md:412-431)",
    )
    ap.add_argument("--top-ids", type=int, default=20,
                    help="A6: top-id report size (--topIdCount)")
    ap.add_argument(
        "--dump",
        help="S6: write the filtered rows to this parquet directory (the "
        "reference's -d/--dump BSON sink, TailCommand.java:92-94)",
    )
    ap.add_argument(
        "--dump-with-shard", action="store_true",
        help="partition the dump by shard (--dumpWithShard analog — the "
        "shard travels as a partition directory instead of an appended "
        "field)",
    )
    ap.add_argument(
        "--full-rows", type=int, default=0, metavar="N",
        help="print up to N raw over-threshold rows (--fullDocument "
        "analog, TailCommand.java:86-88); requires --threshold",
    )
    ap.add_argument(
        "--shard-stats", action="store_true",
        help="A8: also print the per-shard ns/op breakdown alongside the "
        "global report (--shardStats, one GROUPING SETS pass)",
    )
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

    from pyspark.sql import functions as F

    from oplog_analyzer_spark.operators import aggregate as A
    from oplog_analyzer_spark.operators import filters as FL
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
    if args.shard_index or args.shard_stats or (args.dump and args.dump_with_shard):
        if "shard" not in df.columns:
            df = df.withColumn(
                "shard", F.pmod(F.xxhash64("conv_id"), F.lit(args.shards)).cast("int")
            )
    if args.shard_index:
        df = FL.shard_subset_by_index(
            df, [int(x) for x in args.shard_index.split(",")], "shard"
        )
    df = FL.row_limit(df, args.limit)
    if args.dump:
        writer = df.write.mode("overwrite")
        if args.dump_with_shard:
            writer = writer.partitionBy("shard")
        writer.parquet(args.dump)
        df = spark.read.parquet(args.dump)  # report over the dumped rows
    buckets = tuple(int(b) for b in args.buckets.split(",")) if args.buckets else ()
    print(console_report(
        A.ns_op_report(df, buckets=buckets), limit=50,
        style=args.style, buckets=buckets,
    ))
    if args.shard_stats:
        print("\n--- PER-SHARD BREAKDOWN (A8) ---")
        print(console_report(
            A.shard_grouping_sets(df, "shard").orderBy("shard", "ns", "op"),
            limit=100,
        ))
    if args.threshold is not None:
        # F5 side output: flagged rows reported separately, NOT removed
        # from the main aggregation above (TailCommand.java:716-723)
        over = FL.threshold_flag(df, args.threshold).filter("over_threshold")
        print(f"\n--- OPS >= {args.threshold} B (F5 side output) ---")
        print(console_report(A.ns_op_report(over), limit=50))
        if args.full_rows:
            print(f"--- FIRST {args.full_rows} OVER-THRESHOLD ROWS ---")
            for r in over.orderBy("ns", "id").limit(args.full_rows).collect():
                print(r.asDict())
    if args.id_stats:
        base = (
            FL.id_stats_threshold(df, args.id_stats_threshold)
            if args.id_stats_threshold
            else df
        )
        print(f"\n--- TOP {args.top_ids} IDS (A5/A6) ---")
        print(console_report(A.top_k_ids(A.id_stats(base), k=args.top_ids)))


if __name__ == "__main__":
    main()
