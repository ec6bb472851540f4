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
