"""Deterministic sampling / dataset-split primitives for training-data
pipelines.

A 10^12-row corpus needs train/val/test splits and per-stratum samples
that are (a) reproducible run-to-run, (b) invariant to partitioning and
row order, (c) stable under incremental reprocessing — a document keeps
its split when the corpus is re-read, re-partitioned, or grown.  RNG-based
``df.sample`` gives none of that; hashing the stable id gives all three.

Scale posture: ``hash_split`` and ``stratified_sample_fraction`` are pure
narrow maps (one xxhash64 + compare per row, whole-stage codegen, no
shuffle, no Python).  ``stratified_sample_quota`` needs exact per-stratum
counts, so it shuffles once on the stratum key through a ranked window —
use the fraction form when an approximate per-stratum rate is acceptable
at scale.  xxhash64 has no DuckDB counterpart, so these are registered
past the driver's oracle window and verified by the invariance pytest
suite (determinism, partition/order invariance, disjoint-and-complete,
proportion tolerance, exact quotas) — tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; bucket to [0, 10^6) for
# weight resolution of 1e-6 without float boundaries.
_BUCKETS = 1_000_000


def _hash_bucket(id_col: str, seed: int) -> F.Column:
    return F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label by hashing its stable
    id: ``weights`` name→fraction (must sum to ≤ 1; any remainder falls in
    the LAST label).  The assignment is a pure function of (id, seed) —
    repartitioning, reordering, or growing the corpus never moves an
    existing row between splits, which is what keeps eval sets
    uncontaminated across pipeline re-runs.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = _hash_bucket(id_col, seed)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = bucket < F.lit(int(round(edge * _BUCKETS)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample_fraction(
    df: DataFrame,
    strata_cols: list[str],
    fractions: dict | float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep ~fraction of each stratum by hash threshold — deterministic,
    shuffle-free, and each stratum's kept set is a SUBSET of any larger
    fraction's kept set (nested samples: raising 1% → 10% only adds rows,
    never swaps them).  ``fractions`` is one float for all strata or a
    {stratum-value-tuple or scalar: fraction} map over ``strata_cols``
    values (unlisted strata are dropped)."""
    bucket = _hash_bucket(id_col, seed)
    if isinstance(fractions, dict):
        key = (
            F.col(strata_cols[0])
            if len(strata_cols) == 1
            else F.struct(*[F.col(c) for c in strata_cols])
        )
        cond = F.lit(False)
        for val, frac in fractions.items():
            lit_val = (
                F.struct(*[F.lit(v) for v in val]) if isinstance(val, tuple) else F.lit(val)
            )
            cond = cond | ((key == lit_val) & (bucket < int(round(frac * _BUCKETS))))
        return df.filter(cond)
    return df.filter(bucket < int(round(float(fractions) * _BUCKETS)))


def stratified_sample_quota(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by deterministic
    hash order (the W1 ranked-window shape — one shuffle on the stratum
    key; a hot stratum is bounded by the rank cutoff at the task that owns
    it).  Deterministic and order-invariant like the fraction form, but
    NOT nested across different n."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.xxhash64(F.lit(seed), F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )
