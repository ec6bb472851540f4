"""Text-analysis operators over a documents table.

Everything here is built from JVM-side pyspark.sql.functions (no Python in
the hot path): token counting, quality scoring, language-ID heuristic and
document fingerprinting all compile into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import fan_out

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


# --- repetition filters (Gopher-style, Rae et al. 2021 §A1.1) ---------------

def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Within-document repetition features — the public Gopher repetition
    rules re-expressed over this corpus:

      dup_token_frac_x10000   1 − distinct/total tokens, ×10000 floored —
                              pure array codegen, no shuffle;
      dup_line_frac_x10000    same over newline-split lines (0 for
                              single-line docs) — codegen, no shuffle;
      top_ngram_frac_x10000   occurrences of the doc's most frequent word
                              n-gram / total n-grams, ×10000 floored.

    The n-gram mode is NOT expressible in whole-stage codegen without an
    O(len²) per-row scan (counting each gram's occurrences with
    ``filter(grams, x -> x = g)`` squares on long documents), so it runs
    as explode → groupBy(id, gram) → groupBy(id): two map-side-combinable
    aggregations whose shuffle keys are hash-uniform doc ids — the
    per-doc gram stream never concentrates on a hot key.  A zero-shuffle
    pandas-UDF Counter pass is the alternative when the cluster is
    shuffle-bound; this form is chosen as default because it stays
    JVM-side and SQL-oracle-able.

    Ratios are ×10000 floored ints (engine-exact, like quality_score).
    Returns ``(id_col, n_tokens, dup_token_frac_x10000,
    dup_line_frac_x10000, top_ngram_frac_x10000)``.
    """
    toks = tokens(text_col)
    lines = F.split(F.col(text_col), r"\n")
    grams_expr = _multiset_ngrams(text_col, n)

    df = fan_out(df, id_col)
    # materialize the gram array BEFORE exploding, and explode_outer + a
    # null-filter on the GENERATED column instead of plain explode:
    # InferFiltersFromGenerate would otherwise stamp the whole gram build
    # into an inferred pre-filter (functions/dedup.py has the full note;
    # measured 5x on this operator at sf0.1)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.floor(
            (F.size(toks) - F.size(F.array_distinct(toks)))
            * 10000
            / F.greatest(F.size(toks), F.lit(1))
        ).cast("long").alias("dup_token_frac_x10000"),
        F.floor(
            (F.size(lines) - F.size(F.array_distinct(lines)))
            * 10000
            / F.greatest(F.size(lines), F.lit(1))
        ).cast("long").alias("dup_line_frac_x10000"),
        grams_expr.alias("__grams"),
    ).select(
        id_col, "n_tokens", "dup_token_frac_x10000", "dup_line_frac_x10000",
        F.explode_outer("__grams").alias("gram"),
    ).filter(F.col("gram").isNotNull())
    per_gram = base.groupBy(
        id_col, "n_tokens", "dup_token_frac_x10000", "dup_line_frac_x10000", "gram"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy(
        id_col, "n_tokens", "dup_token_frac_x10000", "dup_line_frac_x10000"
    ).agg(
        F.floor(F.max("cnt") * 10000 / F.sum("cnt")).cast("long").alias(
            "top_ngram_frac_x10000"
        )
    )


def _multiset_ngrams(text_col: str, n: int) -> F.Column:
    """Word n-grams WITHOUT dedup (the repetition mode needs the multiset;
    dedup.shingles deliberately array_distincts).  Same let-bound single
    tokenization; docs shorter than n tokens yield their whole text."""
    toks_expr = F.split(F.trim(F.col(text_col)), r"\s+")

    def _from_tokens(toks: F.Column) -> F.Column:
        k = F.size(toks) - (n - 1)
        return F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, (i + j).cast("int")) for j in range(n)],
                ),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))

    return F.element_at(F.transform(F.array(toks_expr), _from_tokens), 1)


def repetition_ok(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_dup_token_frac_x10000: int = 3000,
    max_top_ngram_frac_x10000: int = 1800,
    min_tokens_for_ngram_rule: int = 12,
) -> DataFrame:
    """Gopher-style go/no-go verdict on top of repetition_stats (thresholds
    are the published spirit — "mostly repeated content is filtered" — not
    the paper's exact constants, which are char-based).

    The top-n-gram rule SATURATES on short docs (a k-token doc's top bigram
    fraction is ≥ 1/(k−1) even with zero repetition), so it only applies at
    ``min_tokens_for_ngram_rule`` tokens and above — the mode of a tiny
    multiset says nothing about repetition."""
    stats = repetition_stats(df, id_col=id_col, text_col=text_col, n=n)
    return stats.withColumn(
        "repetition_ok",
        (F.col("dup_token_frac_x10000") <= max_dup_token_frac_x10000)
        & (
            (F.col("n_tokens") < min_tokens_for_ngram_rule)
            | (F.col("top_ngram_frac_x10000") <= max_top_ngram_frac_x10000)
        ),
    )


#: the stop-word set of Gopher rule 7 (Rae et al. 2021, §A1.1): a document
#: must contain at least ``min_stopword_types`` DISTINCT members.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: feature column order shared by gopher_rules and its oracle twin
_GOPHER_FEATURES = (
    "n_words", "mean_word_len_x100", "symbol_word_ratio_x10000",
    "bullet_line_frac_x10000", "ellipsis_line_frac_x10000",
    "alpha_word_frac_x10000", "stopword_types",
)


def _gopher_feature_exprs(text_col: str) -> dict[str, F.Column]:
    """The seven Gopher feature expressions as named Columns — pure
    array/regexp codegen over one text column, shared by the audit frame
    (:func:`gopher_rules`) and the inline gate (:func:`gopher_ok_expr`)."""
    words = tokens(text_col)
    n_words = F.size(words)
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    txt = F.col(text_col)

    sum_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, r"#", ""))
    n_ellipsis = (F.size(F.split(txt, r"\.\.\.", -1)) - 1) + (
        F.size(F.split(txt, r"…", -1)) - 1
    )
    n_bullet_lines = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]\s")))
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop_types = F.size(F.array_intersect(words, stop_arr))

    def _ratio_x10000(num: F.Column, den: F.Column) -> F.Column:
        return F.floor(num * 10000 / F.greatest(den, F.lit(1))).cast("long")

    return {
        "n_words": n_words.cast("long"),
        "mean_word_len_x100": F.floor(
            sum_word_chars * 100 / F.greatest(n_words, F.lit(1))
        ).cast("long"),
        "symbol_word_ratio_x10000": _ratio_x10000(n_hash + n_ellipsis, n_words),
        "bullet_line_frac_x10000": _ratio_x10000(n_bullet_lines, n_lines),
        "ellipsis_line_frac_x10000": _ratio_x10000(n_ellipsis_lines, n_lines),
        "alpha_word_frac_x10000": _ratio_x10000(n_alpha_words, n_words),
        "stopword_types": n_stop_types.cast("long"),
    }


def gopher_ok_expr(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_x100: int = 300,
    max_mean_word_len_x100: int = 1000,
    max_symbol_word_ratio_x10000: int = 1000,
    max_bullet_line_frac_x10000: int = 9000,
    max_ellipsis_line_frac_x10000: int = 3000,
    min_alpha_word_frac_x10000: int = 8000,
    min_stopword_types: int = 2,
) -> F.Column:
    """The ``gopher_ok`` conjunction as a single boolean Column, for
    gating with a plain ``df.filter(...)`` — no join, no shuffle, and no
    plan collapse when the gate empties the corpus (a semi-join form lets
    AQE's empty-relation propagation drop upstream CollectMetrics nodes).
    Same thresholds and bit-exact features as :func:`gopher_rules`."""
    f = _gopher_feature_exprs(text_col)
    return (
        (f["n_words"] >= min_words)
        & (f["n_words"] <= max_words)
        & (f["mean_word_len_x100"] >= min_mean_word_len_x100)
        & (f["mean_word_len_x100"] <= max_mean_word_len_x100)
        & (f["symbol_word_ratio_x10000"] <= max_symbol_word_ratio_x10000)
        & (f["bullet_line_frac_x10000"] <= max_bullet_line_frac_x10000)
        & (f["ellipsis_line_frac_x10000"] <= max_ellipsis_line_frac_x10000)
        & (f["alpha_word_frac_x10000"] >= min_alpha_word_frac_x10000)
        & (f["stopword_types"] >= min_stopword_types)
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_x100: int = 300,
    max_mean_word_len_x100: int = 1000,
    max_symbol_word_ratio_x10000: int = 1000,
    max_bullet_line_frac_x10000: int = 9000,
    max_ellipsis_line_frac_x10000: int = 3000,
    min_alpha_word_frac_x10000: int = 8000,
    min_stopword_types: int = 2,
) -> DataFrame:
    """The full Gopher document-level quality rule set (Rae et al. 2021,
    §A1.1 Table A1), complementing the repetition subset in
    :func:`repetition_ok`:

      1. word count in [min_words, max_words]
      2. mean word length in [3, 10] chars
      3. symbol-to-word ratio ≤ 0.1 (symbols = '#' and ellipses '…'/'...')
      4. ≤ 90% of lines start with a bullet ('-', '*', '•')
      5. ≤ 30% of lines end with an ellipsis
      6. ≥ 80% of words contain ≥ 1 alphabetic character
      7. ≥ 2 distinct members of GOPHER_STOPWORDS present

    All ratios are ×10000-floored ints (×100 for mean word length) so both
    engines agree bit-for-bit, the house contract since quality_score.
    Emits one feature column + one boolean per rule plus the conjunction
    ``gopher_ok``.

    Plan: every rule is pure array/regexp codegen in one projection — no
    Python, no join; at 100 TB this is a free rider on whatever scan the
    pipeline already does (fan_out fires only on coarse single-row-group
    scans, where the regex battery would otherwise run on 1-2 tasks).  Thresholds are the paper's
    constants; they are parameters because the paper itself retunes them
    per corpus.
    """
    f = _gopher_feature_exprs(text_col)
    feat = fan_out(df, id_col).select(
        F.col(id_col), *[f[name].alias(name) for name in _GOPHER_FEATURES]
    )
    rules = feat.select(
        "*",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).alias(
            "rule_word_count"
        ),
        (
            (F.col("mean_word_len_x100") >= min_mean_word_len_x100)
            & (F.col("mean_word_len_x100") <= max_mean_word_len_x100)
        ).alias("rule_mean_word_len"),
        (F.col("symbol_word_ratio_x10000") <= max_symbol_word_ratio_x10000).alias(
            "rule_symbol_ratio"
        ),
        (F.col("bullet_line_frac_x10000") <= max_bullet_line_frac_x10000).alias(
            "rule_bullet_lines"
        ),
        (
            F.col("ellipsis_line_frac_x10000") <= max_ellipsis_line_frac_x10000
        ).alias("rule_ellipsis_lines"),
        (F.col("alpha_word_frac_x10000") >= min_alpha_word_frac_x10000).alias(
            "rule_alpha_words"
        ),
        (F.col("stopword_types") >= min_stopword_types).alias("rule_stopwords"),
    )
    return rules.withColumn(
        "gopher_ok",
        F.col("rule_word_count")
        & F.col("rule_mean_word_len")
        & F.col("rule_symbol_ratio")
        & F.col("rule_bullet_lines")
        & F.col("rule_ellipsis_lines")
        & F.col("rule_alpha_words")
        & F.col("rule_stopwords"),
    )


# --- PII redaction ----------------------------------------------------------

#: Patterns valid and equivalent in BOTH Java regex (Spark) and RE2
#: (DuckDB) — the oracle contract.  Kept deliberately simple; the point is
#: the pipeline shape (chained vectorized regexp_replace + counts on one
#: scan), not regex erudition.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phones", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Redact emails, IPv4 addresses and phone numbers; emit per-type match
    counts (``n_emails``/``n_ipv4``/``n_phones``) plus the redacted text.

    Counts are taken against the PRE-redaction text per type while the
    replacements chain in PII_PATTERNS order (emails first, so an address's
    host part can't be half-eaten by the IP rule) — all on one projection:
    whole-stage codegen, one scan, no Python, no shuffle."""
    out = df
    redacted = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn(out_col, redacted)


#: GPT-2-style pretokenizer pattern, restricted to the Java∩RE2 dialect —
#: NO lookahead (the original's ``\s+(?!\S)`` is not RE2-expressible), so
#: trailing-space grouping differs from the real BPE pretokenizer; the
#: point is a codegen'd, oracle-certifiable token count whose growth
#: tracks BPE token counts far better than whitespace splitting on
#: punctuation-dense text.  Alternation order is semantic (leftmost-first
#: in both engines) — keep the two sides byte-identical.
BPE_ISH_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token count: non-overlapping matches of BPE_ISH_PATTERN —
    one ``regexp_count`` per row, whole-stage codegen, no Python.  The
    DuckDB twin is ``len(regexp_extract_all(text, <same pattern>))``."""
    return df.withColumn(
        out_col, F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("long")
    )


def corpus_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    approx: bool = False,
) -> DataFrame:
    """One-row corpus profile — the numbers a 100 TB ingest job prints
    before anything else: document count, total/min/max whitespace tokens,
    distinct normalized texts (the exact-dedup cardinality) and distinct
    documents per the md5 fingerprint.

    ``approx=True`` swaps the two distinct counts for
    ``approx_count_distinct`` (HyperLogLog++, rsd 0.01) — at corpus scale
    an exact distinct is a full shuffle of every normalized text, while
    the sketch rides the same single scan as the other aggregates,
    mergeable and constant-size per partition.  The exact form is the
    SQL-certified one (`corpus_profile` driver row); the sketch form is
    pytest-bounded against it (±5%).

    Plan: one global aggregate (map-side partials), no joins; fan_out
    parallelizes the tokenize projection when the source scan is coarse
    (no-op at real scale, where inputs arrive in many files).
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    n_tokens = F.size(tokens(text_col))
    distinct_texts = (
        F.approx_count_distinct(normalized, rsd=0.01)
        if approx
        else F.count_distinct(normalized)
    )
    distinct_ids = (
        F.approx_count_distinct(F.col(id_col), rsd=0.01)
        if approx
        else F.count_distinct(F.col(id_col))
    )
    return fan_out(df, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        distinct_ids.cast("long").alias("distinct_ids"),
        distinct_texts.cast("long").alias("distinct_texts"),
        F.sum(n_tokens).cast("long").alias("total_tokens"),
        F.min(n_tokens).cast("long").alias("min_tokens"),
        F.max(n_tokens).cast("long").alias("max_tokens"),
    )


# --- corpus-model quality scoring (CCNet-style, Wenzek et al. 2020) ----------

def _char_trigrams(text_col: str) -> F.Column:
    """Array of character trigrams of lower(trim(text)); < 3 chars → empty.
    The guard matters: Spark's ``sequence(1, 0)`` counts DOWN ([1, 0]),
    it does not return empty like DuckDB's ``range(1, 1)``."""
    t = F.lower(F.trim(F.col(text_col)))
    n = F.length(t)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: t.substr(i, F.lit(3))
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigram_model(
    df: DataFrame, text_col: str = "text", top_k: int = 1000
) -> DataFrame:
    """The corpus language model behind :func:`trigram_coverage`: the
    ``top_k`` most frequent character trigrams, tie-broken (count desc,
    trigram asc) so the cut is deterministic in both engines.

    Plan: one projection builds the trigram array, one explode, one
    map-side-combined count aggregate, then TakeOrderedAndProject — the
    word-count shape.  Returns ``(g, c)``, at most ``top_k`` rows (small:
    broadcast it into the scoring join)."""
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    exploded = fan_out(df).select(
        F.explode_outer(_char_trigrams(text_col)).alias("g")
    ).filter(F.col("g").isNotNull())
    return (
        exploded.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("g"))
        .limit(top_k)
    )


def trigram_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 1000,
    model: DataFrame | None = None,
    persist_registry: list | None = None,
) -> DataFrame:
    """Corpus-model quality score — the integer-exact analog of CCNet's
    per-document language-model perplexity filter (Wenzek et al. 2020
    score docs with a KenLM model trained on a trusted corpus; with no
    model artifacts allowed, the same fluency signal comes from n-gram
    COVERAGE): the fraction of a document's character trigrams found in
    the corpus's ``top_k`` most frequent trigrams.  Fluent text is built
    from common trigrams; gibberish, wrong-charset and boilerplate-code
    rows sit in the tail.  Pass ``model`` (any ``(g, ...)`` frame, e.g. a
    persisted :func:`trigram_model` of a TRUSTED corpus) to score against
    an external reference instead of self-scoring.

    Returns ``(id_col, n_trigrams, top_hits, trigram_cov_x10000)`` for
    EVERY input row (zero-trigram docs score 0).  Ratio is ×10000 floored
    — engine-exact, no floats.

    Plan: when self-scoring (``model=None``) the exploded (id, trigram)
    frame is built ONCE and persisted — the model aggregate and the
    scoring pass both read the cache, so the corpus text is scanned and
    the trigram arrays materialized a single time (the two-scan form
    measured 7.2 s vs 4.3 s at sf0.1); with an external ``model`` there
    is exactly one scan anyway.  Self-scoring COLLECTS the ≤``top_k``
    model grams (bounded — the dsir-threshold pattern) and scores with
    one InSet aggregate pass over the cache, no join node at all (r7:
    the broadcast-join form copied every cached row through the join
    operator — 1.45 → 0.92 s warm at sf1.0); an external model keeps
    the broadcast hash join.  One doc-keyed aggregate either way
    (partial map-side, shuffle ∝ docs).  No Python anywhere.  The cache
    is left to LRU eviction unless ``persist_registry`` is passed.
    """
    exploded = fan_out(df, id_col).select(
        F.col(id_col), F.explode_outer(_char_trigrams(text_col)).alias("g")
    )
    if model is None:
        exploded = exploded.persist()
        if persist_registry is not None:
            # long-lived callers (run_dataset) unpersist after their
            # terminal action (ADVICE r06: internal persists otherwise
            # accumulate across invocations in one session)
            persist_registry.append(exploded)
        # same deterministic (count desc, trigram asc) cut as
        # trigram_model, derived from the shared exploded frame — and
        # COLLECTED (bounded: exactly top_k short strings, the dsir
        # k-th-threshold pattern) so scoring is one InSet aggregate pass
        # over the cache instead of a join: no join-output row copies,
        # no join operator between the cache scan and the doc aggregate
        # (measured 1.45 → 0.92 s warm at sf1.0)
        model_rows = (
            exploded.filter(F.col("g").isNotNull())
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("g"))
            .limit(top_k)
            .collect()
        )
        grams = [r["g"] for r in model_rows]
        hit = (
            F.when(F.col("g").isin(grams), 1).otherwise(0)
            if grams
            else F.lit(0)
        )
        scored = exploded.groupBy(id_col).agg(
            F.count("g").cast("long").alias("n_trigrams"),
            F.sum(hit).cast("long").alias("top_hits"),
        )
    else:
        # external model: an arbitrary (g, ...) frame — keep the
        # broadcast-join form rather than collecting a caller's table
        hit = F.broadcast(model.select("g").withColumn("__hit", F.lit(1)))
        scored = (
            exploded.join(hit, "g", "left")
            .groupBy(id_col)
            .agg(
                F.count("g").cast("long").alias("n_trigrams"),
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                .cast("long")
                .alias("top_hits"),
            )
        )
    return scored.select(
        F.col(id_col),
        "n_trigrams",
        "top_hits",
        F.when(F.col("n_trigrams") == 0, F.lit(0))
        .otherwise(F.floor(F.col("top_hits") * 10000 / F.col("n_trigrams")))
        .cast("long")
        .alias("trigram_cov_x10000"),
    )


#: Java∩RE2 character classes shared verbatim by clean_text and its SQL
#: twin (the redact_pii dialect discipline).  CONTROL excludes \t \n \r
#: (legitimate layout); VT/FF are stripped HERE because Java's \s matches
#: \x0B but RE2's does not — after this strip, the \s+ squeeze below
#: behaves identically in both dialects.
CLEAN_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
CLEAN_ZEROWIDTH_RE = r"[\x{200B}-\x{200D}\x{FEFF}]"
CLEAN_REPLACEMENT_RE = r"\x{FFFD}"


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_clean",
    form: str = "NFC",
) -> DataFrame:
    """Unicode text hygiene — the ingest-side cleanup every web corpus
    needs before hashing/dedup (byte-different encodings of the SAME
    rendered string must collapse to one canonical form, or exact dedup
    silently misses):

      1. canonical normalization (NFC default; NFKC opt-in — it also
         folds compatibility forms like the ﬁ ligature, so only NFC is
         SQL-oracle-certifiable via DuckDB's nfc_normalize);
      2. count diagnostics on the NORMALIZED string: control characters,
         zero-width characters (ZWSP/ZWNJ/ZWJ/BOM), and U+FFFD
         replacement characters (the mojibake signal);
      3. strip controls + zero-width, squeeze ``\\s+`` to one space,
         trim.

    Adds ``out_col, n_controls, n_zerowidth, n_replacement, changed``
    (``changed`` = cleaned ≠ original).  Counts and strips are pure JVM
    regexp codegen; normalization is the one unavoidable Python step
    (the JVM has no normalizer builtin) — an Arrow-batched pandas UDF
    whose per-element ``str.isascii()`` short-circuit skips the
    normalizer entirely for ASCII rows, the overwhelming majority of a
    web corpus.  One scan, no join; fan_out raises parallelism for the
    normalizer projection when the source scan is coarse (no-op on
    already-shuffled or many-file inputs)."""
    import pandas as pd
    import unicodedata
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm(batch):
        return batch.map(
            lambda s: s
            if s is None or s.isascii()
            else unicodedata.normalize(form, s)
        )

    _norm.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    norm_udf = pandas_udf("string")(_norm)

    normed = fan_out(df).withColumn("__norm", norm_udf(F.col(text_col)))
    counted = normed.select(
        "*",
        F.regexp_count("__norm", F.lit(CLEAN_CONTROL_RE)).cast("long").alias("n_controls"),
        F.regexp_count("__norm", F.lit(CLEAN_ZEROWIDTH_RE)).cast("long").alias("n_zerowidth"),
        F.regexp_count("__norm", F.lit(CLEAN_REPLACEMENT_RE)).cast("long").alias("n_replacement"),
    )
    stripped = F.regexp_replace(
        F.regexp_replace("__norm", CLEAN_CONTROL_RE, ""),
        CLEAN_ZEROWIDTH_RE,
        "",
    )
    return counted.withColumn(
        out_col, F.trim(F.regexp_replace(stripped, r"\s+", " "))
    ).withColumn(
        "changed", F.col(out_col) != F.col(text_col)
    ).drop("__norm")
