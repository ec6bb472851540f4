"""S7/S9/J2 — stats-report JSON sink, source, and re-join.

The reference serializes per-shard per-(ns,op) accumulators to
``<base>_stats.json`` (SampleCommand.java:527-592), reloads them
(AnalyzeCommand.java:763-822) and joins them back into the workload
analysis by shard (J2, AnalyzeCommand.java:132-138).  Spark-first: the
stats report is a DataFrame written as JSON lines; reload is
``spark.read.json``; the re-join is a plain DataFrame join (broadcast —
stats reports are aggregate-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stats_json(report: DataFrame, out_dir: str) -> None:
    """Aggregate report → JSON-lines directory (the _stats.json analog);
    coalesce(1) is safe — the input is an aggregate, not a fact table."""
    report.coalesce(1).write.mode("overwrite").json(out_dir)


def reference_stats_json(
    per_shard_report: DataFrame | list,
    total_processed: int,
    total_sampled: int,
    sampling_period: str,
    timestamp: str,
    processed_ops: dict[str, int] | None = None,
) -> str:
    """Byte-exact reference stats document (SampleCommand.writeStatsAsJson,
    java:548-592): one nested JSON object — header fields, then shards
    sorted ascending, each with processedOps and its collections keyed
    ``ns.op`` sorted by totalBytes DESC, five fixed stat fields apiece,
    with the reference's exact hand-printed indentation and comma
    placement.  ``avgBytes`` is total/count INTEGER division
    (EntryAccumulator.getAvg, java:82).

    Expects an A8-shaped per-shard aggregate (shard, ns, op, count,
    total_size, min_size, max_size) — a DataFrame (aggregate-sized, so the
    collect is bounded) or the already-collected list of its Rows (so a
    caller deriving totals from the same rows doesn't trigger a second
    action).  ``processed_ops`` overrides the per-shard processed counts
    (the reference counts every entry seen, sampled or not); defaults to
    the sum of sampled counts.  Total-desc ties are broken by (ns, op) —
    the reference inherits HashMap iteration order there, which is
    unspecified; ours is pinned for reproducibility (documented
    divergence on ties only).
    """
    rows = (
        per_shard_report
        if isinstance(per_shard_report, list)
        else per_shard_report.collect()
    )
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(str(r["shard"]), []).append(r)

    out: list[str] = ["{"]
    out.append(f'  "timestamp": "{timestamp}",')
    out.append(f'  "samplingPeriod": "{sampling_period}",')
    out.append(f'  "totalProcessed": {total_processed},')
    out.append(f'  "totalSampled": {total_sampled},')
    out.append('  "shards": {')
    shard_ids = sorted(by_shard)
    for i, shard_id in enumerate(shard_ids):
        shard_rows = sorted(
            by_shard[shard_id],
            key=lambda r: (-r["total_size"], r["ns"], r["op"]),
        )
        processed = (
            processed_ops[shard_id]
            if processed_ops is not None
            else sum(r["count"] for r in shard_rows)
        )
        out.append(f'    "{shard_id}": {{')
        out.append(f'      "processedOps": {processed},')
        out.append('      "collections": {')
        for j, r in enumerate(shard_rows):
            out.append(f'        "{r["ns"]}.{r["op"]}": {{')
            out.append(f'          "count": {r["count"]},')
            out.append(f'          "totalBytes": {r["total_size"]},')
            out.append(f'          "avgBytes": {r["total_size"] // r["count"]},')
            out.append(f'          "minBytes": {r["min_size"]},')
            out.append(f'          "maxBytes": {r["max_size"]}')
            out.append("        }," if j < len(shard_rows) - 1 else "        }")
        out.append("      }")
        out.append("    }," if i < len(shard_ids) - 1 else "    }")
    out.append("  }")
    out.append("}")
    return "\n".join(out) + "\n"


def read_stats_json(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.json(out_dir)


def join_stats(facts: DataFrame, stats: DataFrame, on: list[str]) -> DataFrame:
    """J2 — replace sample-derived numbers with authoritative stats where
    present (left join + coalesce per overlapping metric)."""
    overlapping = [c for c in stats.columns if c in facts.columns and c not in on]
    renamed = stats
    for c in overlapping:
        renamed = renamed.withColumnRenamed(c, f"{c}_stats")
    out = facts.join(F.broadcast(renamed), on=on, how="left")
    for c in overlapping:
        out = out.withColumn(c, F.coalesce(F.col(f"{c}_stats"), F.col(c))).drop(
            f"{c}_stats"
        )
    return out
