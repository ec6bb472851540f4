"""SemDeDup: semantic deduplication over an embedding column (Abbas et
al. 2023, arXiv:2303.09540) — cluster the corpus with a deterministic
coarse quantizer, then inside each cluster drop every item whose cosine
similarity to a LOWER-RANKED member exceeds a threshold, where rank
orders members by ascending similarity to their centroid (the paper
keeps the item least similar to the centroid from each duplicate group).

This is the embedding-space sibling of the MinHash/SimHash family in
:mod:`~oplog_analyzer_spark.functions.dedup`: near-duplicate *meaning*
(paraphrases, templated rewrites, translations back into the same
language) that no lexical shingle overlaps.

The drop rule is the paper's actual computation, not a transitive
closure: with cluster members ranked 1..n, member i is a duplicate iff
``max_{j < i} cos(i, j) >= threshold`` — a pure predecessor test on the
per-cluster similarity matrix, which makes the whole verdict frame
reproducible by a plain SQL oracle (rank = one window, the predecessor
max = one inequality self-join), no recursion needed.

Plan shape (the 100 TB posture):

* centroid pick — ``n_clusters`` corpus vectors by deterministic seeded
  hash order: one bounded collect (K×dim, a few MB), shipped in the UDF
  closure (the ``ivf_topk`` pattern — plan size O(1) in K);
* assignment — ONE numpy matmul per Arrow batch, zero shuffle;
* verdicts — ONE shuffle keyed on cluster, then a per-cluster numpy
  similarity matrix (exactly the paper's per-cluster computation,
  vectorized).  Each cluster is materialized whole on one executor, so
  at production scale ``n_clusters`` must grow with the corpus (the
  paper runs tens of thousands of clusters for 10^8-item corpora) and
  ``max_cluster`` caps the quadratic term in any one degenerate cluster.

Reference parity note: the reference engine (mhelmstetter/oplog-analyzer)
has no embedding surface; this operator belongs to the SURVEY §2.11
training-data family built on top of the same engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from .hashing import seeded_hash


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def semdedup_verdicts(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.9,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_cluster: int | None = None,
) -> DataFrame:
    """Per-item SemDeDup verdict frame:

    ``(id, cluster, cent_sim, rnk, max_prior_sim, dup_of, is_dup)``

    * ``cluster`` — the centroid's own item id (centroids are corpus
      vectors chosen by ascending ``seeded_hash(seed, id, hash_fn)``,
      ties by id; assignment is max-cosine, ties to the smaller
      centroid id);
    * ``rnk`` — 1-based rank inside the cluster by (cent_sim ASC,
      id ASC): rank 1 is the member FARTHEST from the centroid and is
      always kept;
    * ``max_prior_sim`` — max cosine to any lower-ranked member
      (−2.0 sentinel for rank 1, where no predecessor exists);
    * ``dup_of`` — smallest id among predecessors with cosine ≥
      ``threshold`` (−1 when none);
    * ``is_dup`` — the drop verdict, ``max_prior_sim >= threshold``.

    ``keep = verdicts.filter(~is_dup)``; the kept set is the paper's
    deduplicated corpus.

    ``max_cluster`` bounds the per-cluster quadratic term: members
    ranked past the cap are ADMITTED without comparison (sentinel
    columns) — the conservative failure mode (missed drops, never false
    drops), same lever posture as ``max_bucket`` in the LSH family.

    ``hash_fn="md5"`` makes the centroid pick — and therefore the whole
    verdict frame — reproducible by an external SQL oracle
    (functions/hashing.py contract).
    """
    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    # no fan_out here (unlike the text family): assignment is one cheap
    # numpy matmul per batch and the verdict stage re-shuffles by cluster
    # anyway — an extra exchange of the embedding arrays measured ~1.5x
    # SLOWER at sf1.0

    # 1. deterministic centroid pick — bounded collect of K small vectors
    cent_rows = (
        df.select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cv"),
            seeded_hash(seed, F.col(id_col), hash_fn).alias("__h"),
        )
        .orderBy("__h", "cent_id")
        .limit(n_clusters)
        .collect()
    )
    if not cent_rows:
        # EMPTY corpus (everything gated away upstream): an empty verdict
        # frame, not a crash — the anti-join caller then drops nothing
        return df.sparkSession.createDataFrame(
            [],
            "id long, cluster long, cent_sim double, rnk int, "
            "max_prior_sim double, dup_of long, is_dup boolean",
        )
    # ascending cent_id so numpy argmax (first max wins) breaks
    # exact-score assignment ties toward the smaller centroid id —
    # the same (cosine DESC, cent_id ASC) order the SQL twin ranks by
    cent_rows = sorted(cent_rows, key=lambda r: int(r["cent_id"]))
    cent_ids = np.asarray([int(r["cent_id"]) for r in cent_rows], dtype=np.int64)
    cent_mat = _normalize_rows(
        np.vstack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    )

    @pandas_udf("cluster long, cent_sim double")
    def assign(batch: pd.Series) -> pd.DataFrame:
        if len(batch) == 0:  # empty Arrow batch — vstack needs >= 1 array
            return pd.DataFrame({
                "cluster": np.empty(0, dtype=np.int64),
                "cent_sim": np.empty(0, dtype=np.float64),
            })
        m = _normalize_rows(np.vstack(batch.to_numpy()).astype(np.float64))
        scores = m @ cent_mat.T
        best = np.argmax(scores, axis=1)
        return pd.DataFrame(
            {
                "cluster": cent_ids[best],
                "cent_sim": scores[np.arange(len(best)), best],
            }
        )

    assigned = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        assign(F.col(vec_col)).alias("a"),
    ).select("id", "v", "a.cluster", "a.cent_sim")

    thr = float(threshold)
    cap = max_cluster
    out_schema = (
        "id long, cluster long, cent_sim double, rnk int, "
        "max_prior_sim double, dup_of long, is_dup boolean"
    )

    def verdicts(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cent_sim", "id"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(pdf)
        lim = n if cap is None else min(n, cap)
        ids = pdf["id"].to_numpy()
        max_prior = np.full(n, -2.0)
        dup_of = np.full(n, -1, dtype=np.int64)
        is_dup = np.zeros(n, dtype=bool)
        if lim > 1:
            m = _normalize_rows(
                np.vstack(pdf["v"].to_numpy()[:lim]).astype(np.float64)
            )
            sims = m @ m.T
            prior = np.tril(np.ones((lim, lim), dtype=bool), k=-1)
            masked = np.where(prior, sims, -np.inf)
            mp = masked.max(axis=1)
            max_prior[1:lim] = mp[1:]
            hit = prior & (sims >= thr)
            id_or_inf = np.where(hit, ids[None, :lim], np.iinfo(np.int64).max)
            mins = id_or_inf.min(axis=1)
            rows_hit = hit.any(axis=1)
            is_dup[:lim] = rows_hit
            dup_of[:lim] = np.where(rows_hit, mins, -1)
        return pd.DataFrame(
            {
                "id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "cent_sim": pdf["cent_sim"].to_numpy(),
                "rnk": np.arange(1, n + 1, dtype=np.int32),
                "max_prior_sim": max_prior,
                "dup_of": dup_of,
                "is_dup": is_dup,
            }
        )

    out = assigned.groupBy("cluster").applyInPandas(verdicts, schema=out_schema)
    # output rounding only (verdicts compare raw doubles): F.round is
    # HALF_UP like the SQL twin's round(); numpy's round is half-even
    return out.select(
        "id",
        "cluster",
        F.round("cent_sim", 4).alias("cent_sim"),
        "rnk",
        F.round("max_prior_sim", 4).alias("max_prior_sim"),
        "dup_of",
        "is_dup",
    )
