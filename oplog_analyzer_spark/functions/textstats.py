"""Text-analysis operators over a documents table.

Everything here is built from JVM-side pyspark.sql.functions (no Python in
the hot path): token counting, quality scoring, language-ID heuristic and
document fingerprinting all compile into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny high-frequency stopword lists for the language-ID heuristic
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
FR_STOPWORDS = ("le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans")


def tokens(text_col: str = "text") -> F.Column:
    """Whitespace tokenization; empty string → empty array."""
    trimmed = F.trim(F.col(text_col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(text_col)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features: lengths, punctuation/digit/stopword ratios, mean
    token length.  Ratios scaled ×10000 and floored to ints so results are
    engine-exact (no float summation-order sensitivity)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.octet_length(text_col)
    punct = n_chars - F.octet_length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    digits = n_chars - F.octet_length(F.regexp_replace(text_col, r"[0-9]", ""))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    out = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_punct", punct.cast("long"))
        .withColumn("n_digits", digits.cast("long"))
        .withColumn("n_stopword_types", n_stop)
        .withColumn(
            "mean_token_len_x100",
            F.floor(
                F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
                * 100
                / F.greatest(n_tokens, F.lit(1))
            ).cast("long"),
        )
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("n_punct") * 4 < F.col("n_chars"))
        & (F.col("n_stopword_types") >= 1),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language heuristic: count distinct stopword hits per
    language, pick the larger; < 2 hits → 'und' (undetermined)."""
    toks = tokens(text_col)
    en = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    fr = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in FR_STOPWORDS])))
    return (
        df.withColumn("en_hits", en)
        .withColumn("fr_hits", fr)
        .withColumn(
            "lang_guess",
            F.when((en < 2) & (fr < 2), "und")
            .when(en >= fr, "en")
            .otherwise("fr"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace/case-normalized text (the
    rolling-hash analog; md5 exists identically in Spark and DuckDB so the
    oracle can reproduce it)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(normalized))
