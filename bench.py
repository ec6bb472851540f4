"""Benchmark runner — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): parse→route→aggregate throughput in
turns/sec over a synthetic transcript corpus scaled to the testdata sf,
plus per-query wall times for the operator battery at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_TURNS         override transcript corpus size
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Workload revision per headline query (VERDICT r04 "What's wrong" #3):
# bump a query's rev whenever its DEFINITION changes (e.g. a5 grew the
# sentinel doc-size aggregates in r4), so round-over-round comparisons of
# BENCH_r{N}.json can tell a changed workload from a changed engine.
QUERY_REV = {
    "a1_ns_op_report": 1,
    "a5_id_stats": 2,  # r4: + sentinel doc-size aggregates + planted doc_size
    "a6_top_ids": 1,
    "a8_grouping_sets": 1,
    "a13_shard_skew": 1,
    "x1_word_explode": 1,
    "j3_broadcast_dims": 1,
    "w1_topk_per_group": 1,
    "w4_reassembly_events": 1,
    "a17_recommendations": 1,
    "tpch_q1": 1,
    "tpch_q3ish": 1,
    # §2.11 dataset-ops family (VERDICT r05 next-round #5): first benched in
    # r6, so each starts at rev 1 — the production xxhash64 forms, not the
    # md5-certification twins
    "dedup_exact": 1,
    "dedup_minhash_lsh": 3,  # r6: + max_bucket cap; then the numpy signature fast path (default family)
    "sampling_split_counts": 1,
    "sequence_packing": 1,
    # r6 additions: transitive CC dedup clusters (the iterative
    # large-star/small-star loop over the capped ngram pair graph) and
    # benchmark decontamination (broadcast gram semi-join)
    "dedup_cc_clusters": 2,  # r6: star-forest fixpoint test replaces the
    # fingerprint round — one fewer star round per run
    "decontam_report": 1,
    # r6 additions: corpus-trigram quality scoring (model + broadcast-join
    # scoring, two corpus scans) and duplicated-span coverage (chunk-hash
    # doc-frequency)
    # rev 2: self-scoring shares ONE persisted exploded (id, trigram)
    # frame between the model aggregate and the scoring join (was two
    # full corpus explodes) — 7.2 s → 0.9 s warm at sf0.1
    "trigram_quality": 2,
    "dup_span_stats": 1,
    # r6 additions: SemDeDup (md5-certified row — the md5 is one hash per
    # id in the centroid pick, not the dominant term; the matmul + cluster
    # shuffle are) and production-form DSIR selection (xxhash64 grams;
    # the md5 twin dsir_weights would bench the certification hash, not
    # the operator)
    "semdedup": 1,
    # rev 2: scores frame cached when k is set — the k-th-threshold probe
    # and the final action share one scores computation (2.8 → 1.0 s warm
    # at sf0.1)
    "dsir_select": 2,
}

HEADLINE_QUERIES = [
    "a1_ns_op_report",
    "a5_id_stats",
    "a6_top_ids",
    "a8_grouping_sets",
    "a13_shard_skew",
    "x1_word_explode",
    "j3_broadcast_dims",
    "w1_topk_per_group",
    "w4_reassembly_events",
    "a17_recommendations",
    "tpch_q1",
    "tpch_q3ish",
    # dataset-ops wall-time trail (exact dedup, minhash LSH with cap,
    # hash-split + stratified quota, greedy packing) — the training-data
    # family had no round-over-round bench coverage before r6
    "dedup_exact",
    "dedup_minhash_lsh",
    "sampling_split_counts",
    "sequence_packing",
    "dedup_cc_clusters",
    "semdedup",
    "dsir_select",
    "decontam_report",
    "trigram_quality",
    "dup_span_stats",
]


def bench_pipeline(spark, n_turns: int) -> tuple[list[float], int]:
    """Time the full parse→enrich→route(write)→aggregate pipeline."""
    from pyspark.sql import functions as F

    from oplog_analyzer_spark import transcripts as T
    from oplog_analyzer_spark.operators.filters import exclude_system_namespaces
    from oplog_analyzer_spark.operators.parse import parse_transcripts, unwind_applyops
    from oplog_analyzer_spark.sources.sinks import (
        per_sink_aggregates,
        route_categories,
        write_routed,
    )

    n_convs = max(1, n_turns // 12)  # ~12 turns/conv average
    df = T.generate_transcripts(spark, num_conversations=n_convs)
    # materialize the input first so generation cost isn't counted
    src = tempfile.mkdtemp(prefix="bench_src_")
    out = tempfile.mkdtemp(prefix="bench_out_")
    try:
        df.write.mode("overwrite").parquet(src)
        inp = spark.read.parquet(src)
        actual_turns = inp.count()
        cat = T.tool_catalog(spark)

        def run(dest: str) -> None:
            routed = route_categories(
                unwind_applyops(exclude_system_namespaces(parse_transcripts(inp))), cat
            )
            write_routed(routed, dest)
            per_sink_aggregates(spark.read.parquet(dest)).collect()

        # one discarded warm run: the first execution of a query shape pays
        # codegen/JIT/python-worker spin-up (measured ~5x on this sandbox);
        # a production run amortizes it to nothing
        warm_out = tempfile.mkdtemp(prefix="bench_warm_")
        try:
            run(warm_out)
        finally:
            shutil.rmtree(warm_out, ignore_errors=True)
        # 3 timed runs: the sandbox host's disk/CPU noise varies by >2x
        # between runs (single virtio disk); min is the engine number,
        # median is reported alongside so round-over-round comparisons can
        # see the noise floor (VERDICT r03 "Next round" #9)
        walls = []
        for _ in range(3):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            run(out)
            walls.append(time.time() - t0)
        return walls, actual_turns
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = 0.1

    import statistics

    import __spark_entry__ as E
    from oplog_analyzer_spark.session import get_spark

    # The battery is PINNED to ≤16 cores: this host's vCPUs past ~16 are
    # oversubscribed (BENCH_scaling.json substrate_note — 16c→32c moved
    # 6.4s only to 4.7s on a 4x core step), so running wider measures host
    # scheduling noise, not the engine (VERDICT r03 "Next round" #9).
    cpus_requested = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cap = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_CPUS", "16"))
    cpus_used = min(cpus_requested, cap)
    spark = get_spark(master=f"local[{cpus_used}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    per_query: dict[str, float] = {}
    per_query_median: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn = qs[name]
        # isolate queries from each other: operators that persist internal
        # frames (dsir counts, minhash signatures) would otherwise leak
        # cache pressure into every LATER query's wall (observed: trigram_
        # quality 3.9 s standalone vs 7.2-7.9 s after dsir_select joined
        # the battery) — each query still gets its own warm run below
        spark.catalog.clearCache()
        fn(spark, sf_dir).collect()  # warm (plan + IO caches)
        # 3 timed runs (fresh plan each — reusing one DataFrame would skip
        # completed shuffle stages); host noise varies >2x, so report BOTH
        # min (the engine number) and median (the noise floor)
        walls = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            walls.append(time.time() - t0)
        per_query[name] = round(min(walls), 3)
        per_query_median[name] = round(statistics.median(walls), 3)

    # default 20M×sf (2M turns at sf0.1): small enough to generate in ~1 min,
    # large enough that the timed run measures the engine rather than fixed
    # per-query overhead (~14k turns/s at 200k turns vs ~100k+ at 2M)
    n_turns = int(os.environ.get("BENCH_TURNS", str(int(20_000_000 * sf_val))))
    spark.catalog.clearCache()  # pipeline measured without query leftovers
    walls, actual = bench_pipeline(spark, n_turns)
    wall = min(walls)
    wall_median = statistics.median(walls)
    throughput = actual / wall if wall > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "parse_route_aggregate_throughput",
                "value": round(throughput, 1),
                "unit": "turns/sec",
                "pipeline_wall_sec": round(wall, 3),
                "pipeline_wall_sec_median": round(wall_median, 3),
                "throughput_median": round(actual / wall_median, 1) if wall_median else 0.0,
                "pipeline_turns": actual,
                "queries": per_query,
                "queries_median": per_query_median,
                "query_rev": {n: QUERY_REV.get(n, 1) for n in HEADLINE_QUERIES},
                "cpus": cpus_used,
                "cpus_requested": cpus_requested,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
