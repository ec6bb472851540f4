"""Round-7 measurement harness — bench.py is FROZEN for the driver, so all
extra instrumentation lives here (spark_optimization_guide.md §1):

  * captures ``explain("formatted")`` per query into plans/<tag>/ so plan
    claims in OPTIMIZATION_r07.md are checkable without running Spark;
  * times each query with the same collect() methodology as bench.py, or
    with the noop sink (§1.4) to isolate computation from result transfer;
  * labels jobs (§1.5) so the timeline is readable if the UI is enabled.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --plans-dir plans/r07 \
      --tag before --queries dedup_cc_clusters tpch_q3ish
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _explain_text(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    import bench
    import __spark_entry__ as E
    from oplog_analyzer_spark.session import get_spark

    p = argparse.ArgumentParser()
    p.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    p.add_argument("--queries", nargs="*", default=None)
    p.add_argument("--plans-dir", default=None, help="write explain('formatted') here")
    p.add_argument("--tag", default="before", help="suffix for plan files")
    p.add_argument("--mode", choices=["collect", "noop"], default="collect")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--no-warm", action="store_true")
    p.add_argument(
        "--plan-only", action="store_true", help="capture plans, skip execution"
    )
    args = p.parse_args()

    cpus = min(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        int(os.environ.get("SPARK_GRAFT_BENCH_MAX_CPUS", "16")),
    )
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    names = args.queries or bench.HEADLINE_QUERIES
    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        df = fn(spark, args.sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            path = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(_explain_text(df))
        if args.plan_only:
            continue

        def run() -> None:
            d = fn(spark, args.sf_dir)
            if args.mode == "noop":
                d.write.format("noop").mode("overwrite").save()
            else:
                d.collect()

        spark.sparkContext.setJobDescription(f"{name} warm")
        if not args.no_warm:
            run()
        walls = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} timed {i}")
            t0 = time.time()
            run()
            walls.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "min": round(min(walls), 3),
            "median": round(statistics.median(walls), 3),
            "samples": [round(w, 3) for w in walls],
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "mode": args.mode, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
