"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline; JVM-side zip_with/
    aggregate dot products, TakeOrderedAndProject per query via a ranked
    window.
  * random-hyperplane LSH buckets — the scale path: a 16-bit signature
    from sign(v·plane_i) computed in ONE vectorized pandas UDF (numpy
    matmul against a broadcast plane matrix), then candidate generation by
    bucket equality.  At 10^9 vectors the bucket join replaces the O(n²)
    crossJoin; exact cosine re-ranks within buckets.

Planes are seeded (numpy default_rng(seed)) so signatures are fully
deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _dot(a: F.Column | str, b: F.Column | str) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def normalize(df: DataFrame, vec_col: str = "embedding", out_col: str = "v") -> DataFrame:
    norm = F.sqrt(_dot(vec_col, vec_col))
    return df.withColumn(
        out_col, F.transform(vec_col, lambda x: (x / norm).cast("double"))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: crossJoin + ranked window.  Correct at
    any scale but O(|Q|·|C|) — keep |Q| bounded or use lsh_bucket_topk."""
    q = normalize(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv")
    )
    c = normalize(corpus, vec_col).select(
        F.col(id_col).alias("c_id"), F.col("v").alias("cv")
    )
    pairs = q.crossJoin(c).filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id", "c_id", _dot("qv", "cv").alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def top1_neighbor(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    max_queries: int | None = None,
) -> DataFrame:
    """Top-1 nearest neighbor (excluding self) for each (optionally
    bounded) query id — the oracle-friendly ANN baseline."""
    q = df if max_queries is None else df.filter(F.col(id_col) < max_queries)
    out = brute_force_topk(q, df, k=1, id_col=id_col, vec_col=vec_col)
    return out.select("q_id", F.col("c_id").alias("nn_id"), "cosine")


def make_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    return np.asarray(
        np.random.default_rng(seed).standard_normal((dim, n_planes)), dtype=np.float64
    )


def lsh_signatures(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """16-bit random-hyperplane signature per vector, one numpy matmul per
    Arrow batch (vectorized pandas UDF — no per-row Python)."""
    planes_b = planes  # captured in the UDF closure, shipped once per task

    @pandas_udf(IntegerType())
    def signature(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes_b) > 0  # (batch, n_planes)
        weights = (1 << np.arange(planes_b.shape[1])).astype(np.int64)
        return pd.Series(bits @ weights).astype("int32")

    return df.withColumn("bucket", signature(F.col(vec_col)))


def lsh_bucket_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same LSH bucket,
    exact cosine re-rank within bucket.  The self-join key is the bucket —
    at scale this is the difference between a shuffle keyed on ~2^n_planes
    uniform buckets and an O(n²) crossJoin."""
    sigs = lsh_signatures(normalize(df, vec_col), make_planes(dim, n_planes, seed), id_col, vec_col)
    a = sigs.select(F.col(id_col).alias("q_id"), F.col("v").alias("qv"), "bucket")
    b = sigs.select(F.col(id_col).alias("c_id"), F.col("v").alias("cv"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.select("q_id", "c_id", _dot("qv", "cv").alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cosine", 4).alias("cosine"), "rank")
    )
