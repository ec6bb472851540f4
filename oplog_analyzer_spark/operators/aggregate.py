"""A1–A16 — the aggregate family.

The reference accumulates per-(namespace, op) statistics in per-thread
ConcurrentHashMaps merged at the end (EntryAccumulator.java:41-71, 210-228;
TailCommand.java:1084-1146).  Expressed as groupBy().agg(), Catalyst's
HashAggregateExec performs exactly that partial-per-partition + shuffled
final merge, with whole-stage codegen — no custom code.

Parity quirks deliberately replicated:
  * avg is integer floor division total/count (EntryAccumulator.java:82,192)
  * doc-size "-1 = unknown" sentinel rows are excluded from doc-size
    aggregates but still counted (TailCommand.java:176-181)
  * threshold buckets count rows with size strictly > bucket
    (EntryAccumulator.java:65-70)
Quirks deliberately NOT replicated (documented divergence):
  * ScanCommand's lossy merge replaying count×avg (ScanCommand.java:338-356)
    destroys true min/max — we keep TailCommand's correct merge semantics.
  * the Caffeine-evicting approximate per-id top-k (IdStatisticsManager.java:
    30-33) — Spark shuffles, so we compute the exact top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ns_op_report(
    df: DataFrame,
    ns_col: str = "ns",
    op_col: str = "op",
    size_col: str = "size",
    buckets: Sequence[int] = (),
    elements_col: str | None = None,
    diff_fields_col: str | None = None,
) -> DataFrame:
    """A1+A3+A4+O1 — the core accumulator report.

    GROUP BY (ns, op) → count / total / min / max / floor-avg bytes
    (EntryAccumulator.java:41-71), optional per-threshold bucket counts
    (A3, EntryAccumulator.java:65-70) and conditional averages over rows
    with positive element / diff-field counts (A4, EntryAccumulator.java:
    55-63, 94-107), sorted by total desc (BaseOplogCommand.java:259-261).
    """
    size = F.col(size_col)
    aggs = [
        F.count(F.lit(1)).alias("count"),
        F.sum(size).alias("total_size"),
        F.min(size).alias("min_size"),
        F.max(size).alias("max_size"),
    ]
    for b in buckets:
        aggs.append(
            F.sum(F.when(size > F.lit(int(b)), 1).otherwise(0)).alias(f"gt_{b}")
        )
    if elements_col is not None:
        c = F.col(elements_col)
        # avg over rows where count > 0 only (EntryAccumulator.java:55-58)
        aggs.append(
            (F.sum(F.when(c > 0, c)) / F.count(F.when(c > 0, c))).alias("avg_elements")
        )
    if diff_fields_col is not None:
        c = F.col(diff_fields_col)
        aggs.append(
            (F.sum(F.when(c > 0, c)) / F.count(F.when(c > 0, c))).alias("avg_diff_fields")
        )
    out = df.groupBy(F.col(ns_col).alias("ns"), F.col(op_col).alias("op")).agg(*aggs)
    # floor-division average (EntryAccumulator.java:82) — derived, not stored
    out = out.withColumn(
        "avg_size", F.floor(F.col("total_size") / F.col("count")).cast("long")
    )
    return out.orderBy(F.desc("total_size"), "ns", "op")


def id_stats(
    df: DataFrame,
    ns_col: str = "ns",
    id_col: str = "id",
    oplog_size_col: str = "size",
    doc_size_col: str | None = None,
) -> DataFrame:
    """A5 — per-(ns, id) statistics (TailCommand.java:161-195).

    doc-size aggregates skip the -1 "unknown" sentinel rows while count and
    oplog-size aggregates include them (TailCommand.java:176-181,
    IdStatisticsManager.java:38-90).  Exact group-by — the reference's
    bounded-cache eviction (A7) is an artifact of single-node memory, not a
    semantic we carry over.
    """
    osize = F.col(oplog_size_col)
    aggs = [
        F.count(F.lit(1)).alias("count"),
        F.sum(osize).alias("total_oplog_size"),
        F.min(osize).alias("min_oplog_size"),
        F.max(osize).alias("max_oplog_size"),
    ]
    if doc_size_col is not None:
        known = F.when(F.col(doc_size_col) >= 0, F.col(doc_size_col))
        aggs += [
            F.sum(known).alias("total_doc_size"),
            F.min(known).alias("min_doc_size"),
            F.max(known).alias("max_doc_size"),
            F.count(known).alias("doc_size_count"),
        ]
    return df.groupBy(F.col(ns_col).alias("ns"), F.col(id_col).alias("id")).agg(*aggs)


def top_k_ids(stats: DataFrame, k: int = 20, per_ns: bool = False) -> DataFrame:
    """A6/O3 — top-k ids by count (TailCommand.java:1708-1712, default 20).

    Global form compiles to TakeOrderedAndProject (partial top-k per
    partition, no full sort).  ``per_ns`` uses a ranked window — the
    scale-path when one report per namespace is wanted (W1).
    """
    if per_ns:
        w = Window.partitionBy("ns").orderBy(F.desc("count"), F.asc("id"))
        return (
            stats.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("rank")
        )
    return stats.orderBy(F.desc("count"), F.asc("ns"), F.asc("id")).limit(k)


def shard_grouping_sets(
    df: DataFrame,
    shard_col: str,
    ns_col: str = "ns",
    op_col: str = "op",
    size_col: str = "size",
) -> DataFrame:
    """A8 — simultaneous global + per-shard accumulators.

    The reference maintains two map hierarchies updated per row
    (TailCommand.java:367-381, 996-1012).  One GROUPING SETS pass computes
    both groupings from a single scan; grouping(shard) distinguishes the
    global rows (shard NULL).
    """
    size = F.col(size_col)
    return (
        df.groupingSets(
            [[shard_col, ns_col, op_col], [ns_col, op_col]],
            shard_col,
            ns_col,
            op_col,
        )
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum(size).alias("total_size"),
            F.min(size).alias("min_size"),
            F.max(size).alias("max_size"),
        )
        .withColumnRenamed(shard_col, "shard")
    )


def update_frequency(
    df: DataFrame,
    ns_col: str = "ns",
    id_col: str = "id",
    op_col: str = "op",
    size_col: str = "size",
    update_op: str = "u",
) -> DataFrame:
    """A10 — per-(ns, id) update-frequency stats over update ops only
    (AnalyzeCommand.java:69-85, 353-369)."""
    return (
        df.filter(F.col(op_col) == update_op)
        .groupBy(F.col(ns_col).alias("ns"), F.col(id_col).alias("id"))
        .agg(
            F.count(F.lit(1)).alias("update_count"),
            F.sum(size_col).alias("total_size"),
            F.min(size_col).alias("min_size"),
            F.max(size_col).alias("max_size"),
        )
    )


def namespace_rollup(
    df: DataFrame,
    shard_col: str,
    ns_col: str = "ns",
    op_col: str = "op",
    size_col: str = "size",
) -> DataFrame:
    """A11 — per-(shard, ns) rollup with dominant op type.

    The reference's dominantOpType is a last-write quirk
    (AnalyzeCommand.java:341); we compute the true mode via max_by over
    per-op counts — documented divergence (SURVEY.md §2.4 A11).
    """
    per_op = df.groupBy(shard_col, ns_col, op_col).agg(
        F.count(F.lit(1)).alias("op_cnt"),
        F.sum(size_col).alias("op_bytes"),
        F.min(size_col).alias("op_min"),
        F.max(size_col).alias("op_max"),
    )
    return per_op.groupBy(shard_col, ns_col).agg(
        F.sum("op_cnt").alias("op_count"),
        F.sum("op_bytes").alias("total_bytes"),
        F.min("op_min").alias("min_size"),
        F.max("op_max").alias("max_size"),
        F.expr("max_by(op, struct(op_cnt, op))").alias("dominant_op"),
    )


def classify_collections(
    df: DataFrame,
    ns_col: str = "ns",
    size_col: str = "size",
    heavy_avg: int = 5000,
    frequent_ops: int = 10000,
    small_avg: int = 1000,
) -> DataFrame:
    """A12 — collection workload classification (AnalyzeCommand.java:443-457):
    avg>5000 → heavy-updates; ops>10000 && avg<1000 → frequent-small;
    else mixed."""
    agg = df.groupBy(F.col(ns_col).alias("ns")).agg(
        F.count(F.lit(1)).alias("ops"),
        F.sum(size_col).alias("total_bytes"),
    )
    avg = F.col("total_bytes") / F.col("ops")
    return agg.withColumn(
        "pattern",
        F.when(avg > heavy_avg, "heavy-updates")
        .when((F.col("ops") > frequent_ops) & (avg < small_avg), "frequent-small")
        .otherwise("mixed"),
    )


def shard_skew(
    df: DataFrame,
    shard_col: str,
    size_col: str = "size",
    deviation_pct: float = 20.0,
) -> DataFrame:
    """A13 — shard-skew deviation vs cluster average
    (AnalyzeCommand.java:590-626): per-shard ops/bytes, percent deviation
    from the all-shard mean, flag when |deviation| > 20%.

    Agg-of-agg via an empty-frame window — a single extra exchange over the
    (tiny) per-shard aggregate, never over the fact table.
    """
    per_shard = df.groupBy(F.col(shard_col).alias("shard")).agg(
        F.count(F.lit(1)).alias("ops"),
        F.sum(size_col).alias("bytes"),
    )
    w = Window.partitionBy()
    return (
        per_shard.withColumn("avg_ops", F.avg("ops").over(w))
        .withColumn("avg_bytes", F.avg("bytes").over(w))
        .withColumn(
            "ops_deviation_pct",
            (F.col("ops") - F.col("avg_ops")) / F.col("avg_ops") * 100.0,
        )
        .withColumn(
            "bytes_deviation_pct",
            (F.col("bytes") - F.col("avg_bytes")) / F.col("avg_bytes") * 100.0,
        )
        .withColumn(
            "skewed",
            (F.abs(F.col("ops_deviation_pct")) > deviation_pct)
            | (F.abs(F.col("bytes_deviation_pct")) > deviation_pct),
        )
        .drop("avg_ops", "avg_bytes")
    )


def cross_shard_comparison(
    df: DataFrame,
    shard_col: str,
    ns_col: str = "ns",
    id_col: str = "id",
    size_col: str = "size",
) -> DataFrame:
    """A14 — per-(ns, shard) ops / bytes / distinct ids vs the per-ns
    cluster average (AnalyzeCommand.java:656-703)."""
    per = df.groupBy(F.col(ns_col).alias("ns"), F.col(shard_col).alias("shard")).agg(
        F.count(F.lit(1)).alias("ops"),
        F.sum(size_col).alias("bytes"),
        F.countDistinct(id_col).alias("unique_ids"),
    )
    w = Window.partitionBy("ns")
    return per.withColumn("ns_avg_ops", F.avg("ops").over(w)).withColumn(
        "ns_avg_bytes", F.avg("bytes").over(w)
    )


def global_counters(df: DataFrame, ns_col: str = "ns", size_col: str = "size") -> DataFrame:
    """A15 — running totals + largest doc and its namespace
    (TailCommand.java:149-153, 626-634)."""
    return df.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(size_col).alias("total_bytes"),
        F.max(size_col).alias("largest_doc"),
        F.expr(f"max_by({ns_col}, struct({size_col}, {ns_col}))").alias("largest_doc_ns"),
    )


def recommendations(
    df: DataFrame,
    shard_col: str,
    ns_col: str = "ns",
    size_col: str = "size",
    skew_factor: float = 2.0,
    heavy_avg: float = 5000.0,
    frequent_ops: int = 10000,
    small_avg: float = 1000.0,
) -> DataFrame:
    """A17 — the analyze command's recommendation layer
    (AnalyzeCommand.java:486-533): compose the per-shard workload (A16) and
    per-collection pattern (A12) aggregates into actionable rows.

      * one ``shard_key`` row when >1 shard and max(avg bytes/op) >
        skew_factor × min(avg bytes/op) — the reference's 2× skew gate
        (AnalyzeCommand.java:492-505), metric = the skew ratio;
      * one ``collection`` row per heavy-updates ns ("document bucketing or
        field-level updates") and per frequent-small ns ("batching or
        aggregation pipeline updates"), AnalyzeCommand.java:510-519,
        metric = the ns's avg bytes/op.

    Both inputs are aggregate-sized; the union is trivially small.
    """
    per_shard = df.groupBy(F.col(shard_col).alias("shard")).agg(
        F.count(F.lit(1)).alias("ops"), F.sum(size_col).alias("bytes")
    ).withColumn("avg_per_op", F.col("bytes") / F.col("ops"))
    skew = (
        per_shard.agg(
            F.max("avg_per_op").alias("mx"),
            F.min("avg_per_op").alias("mn"),
            F.count(F.lit(1)).alias("n_shards"),
        )
        .filter((F.col("n_shards") > 1) & (F.col("mx") > F.col("mn") * skew_factor))
        .select(
            F.lit("shard_key").alias("kind"),
            F.lit("cluster").alias("subject"),
            F.lit(
                "add high-cardinality field / hashed shard key / split large documents"
            ).alias("recommendation"),
            F.round(F.col("mx") / F.col("mn"), 4).alias("metric"),
        )
    )
    patterns = classify_collections(
        df, ns_col, size_col,
        heavy_avg=heavy_avg, frequent_ops=frequent_ops, small_avg=small_avg,
    )
    coll = patterns.filter(F.col("pattern") != "mixed").select(
        F.lit("collection").alias("kind"),
        F.col("ns").alias("subject"),
        F.when(
            F.col("pattern") == "heavy-updates",
            "document bucketing or field-level updates",
        ).otherwise("batching or aggregation pipeline updates").alias("recommendation"),
        F.round(F.col("total_bytes") / F.col("ops"), 4).alias("metric"),
    )
    return skew.unionAll(coll)


def workload_buckets(
    per_shard: DataFrame,
    avg_bytes_threshold: float = 2000.0,
) -> DataFrame:
    """A16 — shards bucketed heavy/light by avg bytes per op
    (AnalyzeCommand.java:405-437); expects A13's per-shard aggregate."""
    avg = F.col("bytes") / F.col("ops")
    return per_shard.withColumn(
        "workload_class",
        F.when(avg > avg_bytes_threshold, "heavy").otherwise("light"),
    ).orderBy("workload_class", F.desc("bytes"))
