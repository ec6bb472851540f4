"""Routing fan-out sinks + metrics/lineage tables.

The reference routes every passing row to a per-shard gzip dump file
(TailCommand.java:276-361) and serializes aggregate stats to JSON
(SampleCommand.java:527-592).  Spark-first: one ``partitionBy(category)``
write fans out to per-category directories with per-task writers — no
writer contention, no driver involvement — and the stats report is itself a
DataFrame written to a metrics table.

Iceberg note: the sandbox lacks the iceberg-spark-runtime jar, so sinks are
parquet directories with identical layout + a manifest (lineage) table; the
writer API is isolated here so swapping ``format("iceberg")`` in is a
one-line change (SURVEY.md §7.5.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import _NON_SCAN_NODES


def _cheaply_rescannable(df: DataFrame) -> bool:
    """True when ``df`` is a plain (possibly projected/filtered) source
    scan that two aggregation branches can each read for the cost of one
    column-pruned scan — false for computed frames (joins, explodes,
    aggregates, Python stages upstream), where referencing the frame twice
    would re-execute the whole chain twice."""
    try:
        plan = df._jdf.queryExecution().logical().toString()
    except Exception:
        return False
    return not any(node in plan for node in _NON_SCAN_NODES + ("Generate",))


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for the iceberg-spark-runtime jar on the session's classpath.

    The north_rule names Iceberg sinks; this sandbox ships no
    iceberg-spark-runtime jar and has no network to fetch one
    (spark.jars.packages needs a resolver), so the probe returns False here
    and the writers below fall back to identically-laid-out parquet
    directories.  On a cluster with the jar present, pass
    ``format="iceberg"`` to write_routed and the same code writes Iceberg
    tables (plus a catalog config in spark-defaults).
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def route_categories(
    df: DataFrame,
    tool_catalog: DataFrame,
    tool_col: str = "tool",
    default_category: str = "uncat",
) -> DataFrame:
    """Assign every row its routing category via broadcast lookup on the
    tool dimension; tools missing from the catalog fall back to a default
    (left-outer + coalesce — the J1 fallback pattern,
    TailCommand.java:456-458)."""
    dim = tool_catalog.select(tool_col, "category")
    routed = df.join(F.broadcast(dim), on=tool_col, how="left")
    return routed.withColumn(
        "category", F.coalesce(F.col("category"), F.lit(default_category))
    )


def write_routed(
    df: DataFrame, out_dir: str, mode: str = "overwrite",
    target_partitions: int | None = None,
    format: str = "parquet",
) -> None:
    """S6 — fan-out sink: one directory per category, per-task parquet
    writers (the scale path for 10^12 rows — each task streams to its own
    files, exactly the reference's one-file-per-shard contention dodge,
    TailCommand.java:276-292).

    File count is tasks × categories; when the upstream has many small
    partitions, pass ``target_partitions`` to coalesce first — shuffle-free
    (merges map tasks), bounding the small-file count without moving the
    payload bytes (the local-mode stand-in for Iceberg's
    write.distribution-mode / maxRecordsPerFile).
    """
    if target_partitions:
        df = df.coalesce(target_partitions)
    # dictionary encoding off for this sink: routed rows are dominated by
    # unique text/id strings, so the per-column dictionary build mostly
    # fails over to plain encoding anyway — paid in CPU first.  Measured
    # at 20M turns (zstd-1): 23-25 s → 19-23 s write for +4% bytes,
    # read-back unchanged.  Scoped HERE, not session-wide: compact
    # low-cardinality tables (metrics, stats) keep the default.
    writer = (
        df.write.mode(mode)
        .option("parquet.enable.dictionary", "false")
        .partitionBy("category")
        .format(format)
    )
    if format == "iceberg":  # out_dir is a table identifier in this case
        writer.saveAsTable(out_dir)
    else:
        writer.save(out_dir)


def per_sink_aggregates(routed: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """S7 analog — per-sink aggregate report (north_star): per (category,
    ns): op counts, distinct conv_id, min/max ts.  Mirrors the
    OplogTailingAnalyzer accumulator report keyed by routing target.

    ``exact_distinct=True`` is the correctness-gate form: exact
    countDistinct shuffles (category, ns, conv_id) — fine on a cluster
    where the shuffle spreads over every executor's disk/NIC.
    ``exact_distinct=False`` swaps in approx_count_distinct (HLL++, 2%
    rsd): partial sketches merge map-side, so the shuffle carries only
    sketch bytes per group — the form a 10^12-turn run uses.

    Plan shape (r7, exact path): Catalyst's single-query rewrite of
    ``countDistinct`` + regular aggs partial-aggregates on (category, ns,
    conv_id) — and on a turns corpus that key is nearly unique per row
    (measured 6.16M rows → 5.24M groups, a 1.18× reduction), so the first
    exchange shipped ~every row carrying EIGHT dead partial buffers.
    Splitting the regular aggs (full map-side combine down to the tiny
    (category, ns) cardinality) from a keys-only distinct count and
    re-joining the two #output-row frames shrinks that exchange to the
    bare keys: readback aggregate 1.84 → 1.49 s min over 6 interleaved
    rounds at 5M turns / 16c, identical rows.  The join is null-safe so a
    null ns/category group matches its twin exactly as the single-pass
    form groups it.  The HLL path keeps the one-pass form — sketches
    merge map-side, so its exchange never carried the blowup.

    The split fires only when ``routed`` is cheaply re-scannable (a plain
    file scan, e.g. the bench's sink read-back): two branches over a
    COMPUTED frame would re-execute the whole parse→unwind→route chain
    twice (the plan grows a second Generate + join subtree), so those
    callers keep the single-pass form.
    """
    regular = [
        F.count(F.lit(1)).alias("op_count"),
        F.sum(F.when(F.col("op") == "i", 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(F.col("op") == "u", 1).otherwise(0)).alias("n_update"),
        F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("n_delete"),
        F.sum(F.when(F.col("op") == "c", 1).otherwise(0)).alias("n_command"),
    ]
    tail = [
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.sum("size").alias("total_bytes"),
    ]
    if not exact_distinct:
        return routed.groupBy("category", "ns").agg(
            *regular,
            F.approx_count_distinct("conv_id", 0.02).alias("distinct_conv"),
            *tail,
        )
    if not _cheaply_rescannable(routed):
        return routed.groupBy("category", "ns").agg(
            *regular,
            F.countDistinct("conv_id").alias("distinct_conv"),
            *tail,
        )
    base = routed.groupBy("category", "ns").agg(*regular, *tail)
    dist = routed.groupBy("category", "ns").agg(
        F.countDistinct("conv_id").alias("distinct_conv")
    )
    joined = base.join(
        dist,
        base["category"].eqNullSafe(dist["category"])
        & base["ns"].eqNullSafe(dist["ns"]),
    )
    return joined.select(
        base["category"],
        base["ns"],
        "op_count",
        "n_insert",
        "n_update",
        "n_delete",
        "n_command",
        "distinct_conv",
        "min_ts",
        "max_ts",
        "total_bytes",
    )
