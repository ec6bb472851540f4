"""Byte-pair-encoding tokenizer (Sennrich et al. 2016) — real subword
tokenization for the training-data pipeline, factored the way BPE actually
scales on a cluster:

LEARNING operates on the word-FREQUENCY table, not the corpus: one
distributed word count (map-side combined — the only corpus scan), a
bounded, deterministic collect of the top ``max_vocab_words`` entries
(at web scale the word vocabulary is ~10⁷ even when the corpus is 100 TB;
the cap is the documented lever), then the classic greedy merge loop runs
locally over that table.  The loop is O(num_merges × vocab) with
incremental pair-count maintenance — no per-iteration Spark action.

ENCODING is one Arrow-batched pandas UDF: the merge ranks ship in the UDF
closure (≤ num_merges entries), each batch memoizes word → subwords so a
word is encoded once per batch regardless of frequency (Zipf makes the
memo hit rate ≈ 1).  No shuffle; output rows inherit the input
partitioning.

No SQL twin exists for the greedy recurrence (same class as the ANN
candidate generators), so correctness is pinned by pytest: a
hand-computable corpus, the encode/learn consistency invariant, and the
detokenization roundtrip.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: end-of-word marker appended to every word's symbol sequence, so merges
#: crossing the word boundary can't happen and detokenization is exact
END_OF_WORD = "</w>"


def _word_counts(
    df: DataFrame, text_col: str, lowercase: bool, max_vocab_words: int
) -> list[tuple[str, int]]:
    """One corpus scan: whitespace word count, deterministic top cut
    (count desc, word asc).  Bounded collect — max_vocab_words rows."""
    from .textstats import tokens

    t = tokens(text_col)
    w = F.explode(t).alias("w")
    words = df.select(w).filter(F.col("w") != "")
    if lowercase:
        words = words.select(F.lower("w").alias("w"))
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_vocab_words)
    )
    return [(r["w"], r["c"]) for r in top.collect()]


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_vocab_words: int = 1_000_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus.  Ties in pair frequency
    break lexicographically (pair asc) so the table is deterministic —
    invariant to partitioning and input order.

    Returns the merges in rank order, ready for :func:`bpe_encode` (or to
    be persisted as two columns and reloaded)."""
    if num_merges <= 0:
        raise ValueError("num_merges must be positive")
    vocab: dict[tuple[str, ...], int] = {}
    for word, c in _word_counts(df, text_col, lowercase, max_vocab_words):
        vocab[tuple(word) + (END_OF_WORD,)] = c

    # incremental pair counts: pair → total count, and pair → {word: times}
    # so a merge only touches the words that contain it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], dict[tuple[str, ...], int]] = {}

    def _index(word: tuple[str, ...], c: int, sign: int) -> None:
        for a, b in zip(word, word[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + sign * c
            pw = pair_words.setdefault((a, b), {})
            pw[word] = pw.get(word, 0) + sign
            if pw[word] == 0:
                del pw[word]

    for word, c in vocab.items():
        _index(word, c, 1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for pair, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and pair < best[0]):
                best = (pair, c)
        if best is None:
            break  # vocabulary fully merged
        pair = best[0]
        merges.append(pair)
        merged_sym = pair[0] + pair[1]
        for word in list(pair_words.get(pair, ())):
            c = vocab.pop(word)
            _index(word, c, -1)
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_word = tuple(out)
            vocab[new_word] = vocab.get(new_word, 0) + c
            _index(new_word, c, 1)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode ``text_col`` with a learned merge table: adds ``out_col``
    (array<string> of subword tokens, each word terminated by
    :data:`END_OF_WORD`) and ``n_bpe_tokens`` — the real-token-count feed
    for ``pack_sequences``/``chunk_documents``.

    Detokenization contract: join the tokens, drop END_OF_WORD markers →
    exactly the (lowercased) whitespace-normalized input.  Unseen words
    degrade to character tokens, never fail."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, tuple[str, ...]] = {}

        def enc(text: str | None) -> list[str]:
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in text.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _enc(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size(out_col).cast("long")
    )


def bpe_detokenize(tokens_col: str = "bpe_tokens") -> F.Column:
    """Inverse column expression: subword tokens → whitespace-joined text
    (END_OF_WORD becomes the word separator).  Pure JVM built-ins."""
    joined = F.array_join(F.col(tokens_col), "")
    return F.trim(F.regexp_replace(joined, END_OF_WORD, " "))
