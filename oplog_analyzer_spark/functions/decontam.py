"""Benchmark decontamination — drop training docs that overlap an eval set.

The standard pre-training hygiene step (publicly described in the GPT-3
appendix and Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better"): a training document is CONTAMINATED when it shares at
least ``min_hits`` word n-grams with any document in the benchmark/eval
corpus, and contaminated docs are removed before training so eval scores
measure generalization, not memorization.

Scale shape (the whole point at 100 TB): the benchmark side is always
small — eval suites are thousands of documents, so their distinct-gram set
is at most a few million short strings.  The plan therefore never shuffles
the training corpus' gram stream (fan_out may redistribute the COMPACT
source rows once when the scan is coarse — sources/tables.fan_out — which
is a no-op at real scale):

  1. benchmark grams  = one scan of the (tiny) benchmark → distinct grams;
  2. contamination    = explode the training docs' gram arrays and
                        BROADCAST-hash-join against the benchmark gram set
                        (``F.broadcast`` — no exchange on the corpus side);
  3. per-doc verdict  = groupBy(doc id) over the JOIN OUTPUT only, which is
                        proportional to the contaminated grams (tiny),
                        not the corpus;
  4. decontaminate    = one left-anti join of the corpus against the
                        contaminated-id set (itself tiny → broadcast).

Shingling reuses :func:`functions.dedup.shingles` (let-bound single
tokenization, see the O(len²) trap documented there).  Everything is
JVM-side; there is no Python in the path.

Reference anchor: the reference has no decontamination (its corpus is an
oplog); this module is part of the §2.11 training-data family
(SURVEY §2.11), beyond-reference by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles
from ..sources.tables import fan_out


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus as a one-column frame
    ``(gram)`` — the broadcast side of the contamination join.  Documents
    shorter than ``n`` tokens contribute their whole text as one gram
    (same fallback as the dedup shingle pass, so a short eval prompt still
    decontaminates its exact copies)."""
    # materialized array + explode_outer + null-filter (the
    # InferFiltersFromGenerate re-stamping trap — functions/dedup.py note)
    return (
        fan_out(bench).select(shingles(text_col, n).alias("__sh"))
        .select(F.explode_outer("__sh").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Per-contaminated-doc report: ``(id_col, hit_grams, total_grams)``
    for every training doc sharing ≥ ``min_hits`` distinct n-grams with
    the benchmark.  ``hit_grams`` counts DISTINCT overlapping grams (the
    gram arrays are distinct by construction), ``total_grams`` the doc's
    distinct gram count — their ratio is the usual contamination severity.

    One broadcast join + one groupBy on the hit stream (see module
    docstring for why the corpus is never shuffled)."""
    grams = fan_out(docs, id_col).select(
        F.col(id_col), shingles(text_col, n).alias("__sh")
    ).select(
        F.col(id_col),
        F.size("__sh").alias("total_grams"),
        F.explode_outer("__sh").alias("gram"),
    ).filter(F.col("gram").isNotNull())
    hits = grams.join(F.broadcast(benchmark_ngrams(bench, text_col, n)), "gram")
    return (
        hits.groupBy(id_col, "total_grams")
        .agg(F.count(F.lit(1)).alias("hit_grams"))
        .filter(F.col("hit_grams") >= min_hits)
        .select(id_col, "hit_grams", "total_grams")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """The training corpus minus contaminated docs (all original columns).
    The contaminated-id set is tiny, so the anti-join broadcasts; the
    corpus itself stays un-shuffled end to end."""
    bad = contamination_report(
        docs, bench, id_col=id_col, text_col=text_col, n=n, min_hits=min_hits
    ).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")

def semantic_contamination_report(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    threshold: float = 0.9,
    max_eval: int = 100_000,
) -> DataFrame:
    """Embedding-space contamination: per TRAIN vector, its max cosine
    against the whole EVAL embedding set, the eval id achieving it
    (ties → smallest eval id), the count of eval vectors at or above
    ``threshold``, and the ``contaminated`` verdict (``max_sim ≥
    threshold``, computed on the exact double before the 4-dp display
    rounding) — the semantic complement of the n-gram
    :func:`contamination_report` (paraphrased eval leakage has no shared
    n-grams but lands next to the eval point in embedding space).

    Scale shape — the corpus is NEVER shuffled and never joined:

      1. the eval set (bounded: eval suites are thousands of vectors;
         ``max_eval`` guards the collect, default 100 k × 1 KiB/vector
         ≈ 100 MiB closure) is collected once, L2-normalized, sorted by
         id, and shipped in the UDF closure — the IVF-centroid pattern
         (``similarity.py::ivf_topk``);
      2. one vectorized pandas UDF computes ALL verdict fields from a
         single (batch × dim) @ (dim × eval) numpy matmul per Arrow
         batch — zero shuffle, zero join, O(1) plan size in |eval|.

    Zero-norm train vectors score ``max_sim`` against the raw dot (0.0
    with every eval point) instead of dividing by zero; an EMPTY eval
    set yields the (-2.0, -1, 0, false) sentinel row per train vector.
    Returns ``(id, max_sim, top_eval_id, n_hits, contaminated)``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    eid = eval_id_col or id_col
    rows = (
        eval_emb.select(F.col(eid).alias("i"), F.col(vec_col).alias("v"))
        .limit(max_eval + 1)
        .collect()
    )
    if len(rows) > max_eval:
        raise ValueError(
            f"eval set exceeds max_eval={max_eval}; semantic decontamination "
            "broadcasts the eval matrix — an unbounded eval side belongs in "
            "the LSH-bucketed near-dup path, not here"
        )
    rows.sort(key=lambda r: r["i"])
    eval_ids = np.asarray([r["i"] for r in rows], dtype=np.int64)
    if len(rows):
        emat = np.asarray([r["v"] for r in rows], dtype=np.float64)
        norms = np.linalg.norm(emat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        emat_t = (emat / norms).T  # (dim, E)
    else:
        emat_t = None
    thr = float(threshold)

    # annotations set explicitly: `from __future__ import annotations`
    # stringifies hints, and pandas_udf cannot resolve the stringified
    # Series -> DataFrame (struct-return) signature
    def _verdict(vecs):
        # empty Arrow batches (empty partitions after an upstream filter)
        # take the sentinel branch too — np.vstack needs >= 1 array
        if emat_t is None or len(vecs) == 0:
            n = len(vecs)
            return pd.DataFrame(
                {
                    "max_sim": np.full(n, -2.0),
                    "top_eval_id": np.full(n, -1, dtype=np.int64),
                    "n_hits": np.zeros(n, dtype=np.int64),
                    "contaminated": np.zeros(n, dtype=bool),
                }
            )
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # (B, dim)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = (mat / norms) @ emat_t  # (B, E)
        mx = sims.max(axis=1)
        return pd.DataFrame(
            {
                "max_sim": mx,
                # argmax returns the FIRST maximal column; eval columns are
                # id-sorted, so ties break to the smallest eval id — the
                # same total order as the SQL twin's (cs DESC, eid ASC)
                "top_eval_id": eval_ids[sims.argmax(axis=1)],
                "n_hits": (sims >= thr).sum(axis=1).astype(np.int64),
                "contaminated": mx >= thr,
            }
        )

    _verdict.__annotations__ = {"vecs": pd.Series, "return": pd.DataFrame}
    _verdict = pandas_udf(
        "max_sim double, top_eval_id long, n_hits long, contaminated boolean"
    )(_verdict)

    out = train_emb.select(
        F.col(id_col).alias("id"), _verdict(F.col(vec_col)).alias("__v")
    )
    return out.select(
        "id",
        F.round(F.col("__v.max_sim"), 4).alias("max_sim"),
        F.col("__v.top_eval_id").alias("top_eval_id"),
        F.col("__v.n_hits").alias("n_hits"),
        F.col("__v.contaminated").alias("contaminated"),
    )


def semantic_decontaminate(
    docs: DataFrame,
    train_emb: DataFrame,
    eval_emb: DataFrame,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    threshold: float = 0.9,
    max_eval: int = 100_000,
) -> DataFrame:
    """The corpus minus semantically contaminated docs: score the TRAIN
    embeddings (``vec_id_col`` values matching ``docs[id_col]``) with
    :func:`semantic_contamination_report` and anti-join the contaminated
    ids away.  The contaminated-id set is verdict-filtered (tiny relative
    to the corpus), so the anti-join broadcasts; a doc with NO embedding
    row is conservatively KEPT (same contract as the lexical
    :func:`decontaminate`: absence of evidence admits)."""
    bad = (
        semantic_contamination_report(
            train_emb,
            eval_emb,
            id_col=vec_id_col,
            vec_col=vec_col,
            eval_id_col=eval_id_col,
            threshold=threshold,
            max_eval=max_eval,
        )
        .filter("contaminated")
        .select(F.col("id").alias(id_col))
    )
    return docs.join(F.broadcast(bad), id_col, "left_anti")
