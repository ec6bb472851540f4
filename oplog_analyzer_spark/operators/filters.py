"""F1–F8 — the filter/predicate family.

Each is a tiny composable function returning a filtered DataFrame.  Because
they are plain Catalyst predicates, all of them are candidates for pushdown
into the parquet/Iceberg scan — the declarative upgrade of the reference's
early-filter-before-decode loop (TailCommand.java:566-588).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exclude_system_namespaces(
    df: DataFrame, ns_col: str = "ns", prefix: str = "config."
) -> DataFrame:
    """F1 — drop rows whose namespace starts with "config."
    (TailCommand.java:566-568)."""
    return df.filter(~F.col(ns_col).startswith(prefix))


def include_namespaces(
    df: DataFrame, namespaces: Sequence[str], ns_col: str = "ns"
) -> DataFrame:
    """F2 — namespace include-list (TailCommand.java:571-573); no-op when
    the list is empty, matching the reference's CLI default."""
    if not namespaces:
        return df
    return df.filter(F.col(ns_col).isin(list(namespaces)))


def include_ops(df: DataFrame, ops: Sequence[str], op_col: str = "op") -> DataFrame:
    """F3 — op-type include-list (TailCommand.java:575-578)."""
    if not ops:
        return df
    return df.filter(F.col(op_col).isin(list(ops)))


def size_range(
    df: DataFrame,
    min_size: int | None = None,
    max_size: int | None = None,
    size_col: str = "size",
) -> DataFrame:
    """F4 — inclusive size-range filter (TailCommand.java:583-624)."""
    if min_size is not None:
        df = df.filter(F.col(size_col) >= min_size)
    if max_size is not None:
        df = df.filter(F.col(size_col) <= max_size)
    return df


def threshold_flag(
    df: DataFrame, threshold: int, size_col: str = "size", flag_col: str = "over_threshold"
) -> DataFrame:
    """F5 — threshold side-output (BaseOplogCommand.java:124-127).

    The reference logs rows with size ≥ threshold but keeps them in the
    aggregate; a flag column preserves single-pass semantics — the side
    output is then ``df.filter(flag)`` without rescanning.
    """
    return df.withColumn(flag_col, F.col(size_col) >= threshold)


def id_stats_threshold(
    df: DataFrame, threshold: int | None, size_col: str = "size"
) -> DataFrame:
    """F6 — second, independent threshold gating the per-id stats branch
    (IdStatisticsManager.java:70-72; "two-threshold system",
    reference README.md:412-431)."""
    if threshold is None:
        return df
    return df.filter(F.col(size_col) >= threshold)


def row_limit(df: DataFrame, n: int | None) -> DataFrame:
    """F7 — stop after n rows (TailCommand.java:765-767).

    NOTE: the reference's limit is per shard worker; for that semantic use
    ``per_shard_limit``.  The plain global limit matches the single-shard
    (replica-set) path.
    """
    if n is None:
        return df
    return df.limit(n)


def per_shard_limit(
    df: DataFrame, n: int, shard_col: str,
    order_cols: Sequence[str] | str = "ts",
) -> DataFrame:
    """F7 (sharded form) — first n rows per shard in ts order, via a ranked
    window rather than per-partition state.  Pass extra ``order_cols`` as
    tie-breakers to make the cut deterministic under ts collisions."""
    from pyspark.sql import Window

    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(shard_col).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def shard_subset(
    df: DataFrame, shard_ids: Sequence[str], shard_col: str
) -> DataFrame:
    """F8 (resolved form) — keep rows whose shard id is in the given set."""
    if not shard_ids:
        return df
    return df.filter(F.col(shard_col).isin(list(shard_ids)))


def resolve_shard_indexes(
    df: DataFrame, indexes: Sequence[int], shard_col: str
) -> list:
    """F8 index semantics (TailCommand.java:966-989): ``--shardIndex 0,2``
    selects POSITIONS in the sorted distinct shard-id list; out-of-range
    indexes are skipped with a warning in the reference — here simply
    skipped.  The distinct-shard collect is bounded by cluster shard count
    (dozens), never data volume."""
    ids = sorted(r[0] for r in df.select(shard_col).distinct().collect())
    return [ids[i] for i in indexes if 0 <= i < len(ids)]


def shard_subset_by_index(
    df: DataFrame, indexes: Sequence[int] | None, shard_col: str
) -> DataFrame:
    """F8 — shard subset by sorted-list position (TailCommand.java:966-989).
    ``indexes=None`` means all shards, matching the reference default."""
    if indexes is None:
        return df
    return shard_subset(df, resolve_shard_indexes(df, indexes, shard_col), shard_col)
