"""spark-submit entry point: workload analysis + recommendations.

The `analyze` command analog (AnalyzeCommand.java:380-533): per-shard
workload buckets (A16), shard-skew deviation (A13), collection pattern
classification (A12), per-(ns,id) update frequency (A10), cross-shard
comparison (A14), and the composed recommendation layer (A17).

  spark-submit --py-files dist/oplog_analyzer_spark.zip jobs/run_analyze.py \
    --input <dir> [--shards N] [--heavy-avg B] [--frequent-ops N] [--small-avg B]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--shards", type=int, default=4,
                    help="synthesize shard = xxhash(conv_id) %% N when the "
                         "input has no shard column")
    ap.add_argument("--heavy-avg", type=float, default=5000.0)
    ap.add_argument("--frequent-ops", type=int, default=10000)
    ap.add_argument("--small-avg", type=float, default=1000.0)
    ap.add_argument("--top-ids", type=int, default=20)
    ap.add_argument(
        "--stats-file",
        help="J2: stats JSON directory from run_sample — authoritative "
        "per-(ns,op) totals override the scan-derived numbers where "
        "present (AnalyzeCommand --statsFile, java:132-138, 763-822)",
    )
    ap.add_argument(
        "--no-shard-key-analysis", action="store_true",
        help="skip the shard-skew / cross-shard sections "
        "(--shardKeyAnalysis=false)",
    )
    ap.add_argument(
        "--no-workload-grouping", action="store_true",
        help="skip workload buckets + collection patterns "
        "(--workloadGrouping=false)",
    )
    ap.add_argument(
        "--unwind-mode", choices=("parity", "routed"), default="parity",
        help="applyOps unwind semantics: 'parity' replicates the reference "
        "(parent $cmd entry kept alongside inner ops, only *.$cmd "
        "namespaces unwind, system ns re-excluded after the unwind — "
        "TailCommand.java:637-668); 'routed' emits each logical op once",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oplog_analyzer_spark.operators import aggregate as A
    from oplog_analyzer_spark.operators.display import console_report
    from oplog_analyzer_spark.operators.filters import exclude_system_namespaces
    from oplog_analyzer_spark.operators.parse import parse_transcripts, unwind_applyops
    from oplog_analyzer_spark.session import get_spark

    spark = get_spark(master=None, app_name="oplog-analyze")
    parity = args.unwind_mode == "parity"
    df = unwind_applyops(
        exclude_system_namespaces(parse_transcripts(spark.read.parquet(args.input))),
        keep_parent=parity, only_cmd_ns=parity,
    )
    if parity:
        df = exclude_system_namespaces(df)
    if "shard" not in df.columns:
        df = df.withColumn(
            "shard", F.pmod(F.xxhash64("conv_id"), F.lit(args.shards)).cast("int")
        )

    if not args.no_shard_key_analysis:
        print("--- SHARD SKEW (A13) ---")
        print(console_report(A.shard_skew(df, "shard")))
    if not args.no_workload_grouping:
        print("\n--- WORKLOAD GROUPS (A16) ---")
        per_shard = df.groupBy(F.col("shard")).agg(
            F.count(F.lit(1)).alias("ops"), F.sum("size").alias("bytes")
        )
        print(console_report(A.workload_buckets(per_shard)))
        print("\n--- COLLECTION PATTERNS (A12) ---")
        print(console_report(A.classify_collections(
            df, heavy_avg=args.heavy_avg, frequent_ops=args.frequent_ops,
            small_avg=args.small_avg,
        ).orderBy(F.desc("total_bytes"))))
    print("\n--- TOP UPDATED IDS (A10) ---")
    print(console_report(
        A.update_frequency(df).orderBy(F.desc("update_count")).limit(args.top_ids)
    ))
    if not args.no_shard_key_analysis:
        print("\n--- CROSS-SHARD COMPARISON (A14) ---")
        print(console_report(A.cross_shard_comparison(df, "shard")))
    if args.stats_file:
        from oplog_analyzer_spark.operators.aggregate import ns_op_report
        from oplog_analyzer_spark.sources.stats_json import (
            join_stats,
            read_stats_json,
        )

        facts = ns_op_report(df).drop("avg_size")
        stats = read_stats_json(spark, args.stats_file)
        joined = join_stats(facts, stats, on=["ns", "op"])
        print("\n--- AUTHORITATIVE (ns, op) TOTALS (J2, sample stats override) ---")
        print(console_report(joined.orderBy(F.desc("total_size"))))
    print("\n=== OPTIMIZATION RECOMMENDATIONS (A17) ===")
    print(console_report(A.recommendations(
        df, "shard", heavy_avg=args.heavy_avg,
        frequent_ops=args.frequent_ops, small_avg=args.small_avg,
    )))


if __name__ == "__main__":
    main()
