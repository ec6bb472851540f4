"""Bounded parquet sources.

The reference reads (a) a live capped collection, (b) a bounded ts-range
scan, (c) length-prefixed BSON dump files with transparent gzip
(BaseOplogCommand.java:298-384).  Columnar parquet replaces the hand-rolled
framing; Spark's vectorized reader replaces the 64 KB buffered decode loop.
Filters and projections expressed on these DataFrames reach the scan
(PushedFilters / ReadSchema) — the Spark equivalent of the reference's only
pushdown, the server-side ts-range query (ScanCommand.java:259-267).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def time_range_scan(
    df: DataFrame, ts_col: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """S2 — bounded ts-range scan (ScanCommand.java:236-294).

    The reference builds a $gte/$lte server query; here the between()
    predicate is pushed down to the parquet/Iceberg scan and prunes
    partitions when the table is partitioned by a ts transform.
    """
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        df = df.filter(F.col(ts_col) <= F.lit(end).cast("timestamp"))
    return df


def latest_offset(df: DataFrame, ts_col: str) -> DataFrame:
    """S4 — latest-offset probe (TailCommand.java:1476-1482).

    The reference sorts by $natural desc limit 1 projecting only ts; the
    aggregate form lets Spark do a partial max per partition — no sort.
    To ride an existing groupBy (a latest offset per scanned namespace),
    add :func:`latest_offset_agg` to its agg list instead — a separate
    function because a column can only be evaluated against the frame its
    aggregation runs over, so a ``df`` parameter there would be a dead,
    misleading argument."""
    return df.agg(latest_offset_agg(ts_col))


def latest_offset_agg(ts_col: str) -> F.Column:
    """The S4 probe as an aggregate COLUMN for an existing groupBy."""
    return F.max(ts_col).alias("latest_ts")


def bucket_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a fact table bucketed (and optionally sorted) by its join
    key.  At 100 TB this is the co-located-join path: two tables bucketed
    the same way join with ZERO shuffle of either side — the physical plan
    shows no Exchange above the scans (asserted in tests/test_plans.py).
    Local-mode stand-in for Iceberg's ``bucket(N, col)`` partition
    transform + Spark's storage-partitioned join.
    """
    writer = df.write.mode("overwrite").format("parquet")
    writer = writer.bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed saved tables shuffle-free.  Broadcast is
    disabled for the join so the plan demonstrates the bucketed SortMergeJoin
    without Exchange — at real scale neither side fits a broadcast anyway."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
