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
the training corpus:

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
        bench.select(shingles(text_col, n).alias("__sh"))
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
    grams = docs.select(
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
