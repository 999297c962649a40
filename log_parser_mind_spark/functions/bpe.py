"""Learned subword tokenization: distributed BPE training + encoding.

Fills the one gap in the training-data tokenizer story (text.py stops at
the regex PRE-tokenizer): learn a byte-pair-encoding merge table from a
corpus and encode documents with it, the way a 100 TB pretraining pipeline
sizes its vocabulary and measures token budgets (reference scope: the
token-budget accounting around tokenizer.go; cited in COVERAGE.md).

Scale design — the industry-standard split (SentencePiece / HF tokenizers
train the merge loop over a WORD HISTOGRAM, never the raw corpus):

  1. The only corpus-sized pass is the word histogram: explode the JVM
     regex pre-tokenizer and hash-groupBy — map-side combine collapses it
     to one exchange bounded by DISTINCT WORD TYPES (Heaps-law sublinear
     in corpus size), exactly like the engine's other vocabulary-bounded
     count tables (curate.ngram_lm_scores).
  2. The merge loop runs driver-side over that bounded histogram, capped
     at ``max_word_types`` rows taken deterministically (count DESC, word
     ASC) — the cap is the documented approximation knob, not a silent
     truncation; rank-0 OOV behavior does not exist because single
     characters always remain encodable.
  3. Encoding broadcasts the merge ranks (``num_merges`` entries, KB-MB
     scale) and applies them in an Arrow-batched pandas UDF over the
     JVM-pre-tokenized word arrays, with a per-batch word→tokens cache —
     distinct words per batch, not rows, bound the Python work.

Determinism: the histogram is exact (independent of partitioning), the
merge loop is a pure function of it (tie-break: highest pair count, then
lexicographically smallest pair), and encoding is a pure function of the
merge list — so train and encode are parallelism-invariant by
construction, pinned by tests and an independent-oracle golden.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from log_parser_mind_spark.functions.text import BPE_ISH_PATTERN

__all__ = [
    "bpe_word_histogram",
    "train_bpe",
    "merges_table",
    "merges_from_table",
    "with_bpe_tokens",
]


def _pretokens_expr(text: Column, lowercase: bool) -> Column:
    t = F.coalesce(text, F.lit(""))
    if lowercase:
        t = F.lower(t)
    return F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0))


def bpe_word_histogram(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Exact word-type histogram — the single corpus-sized pass of BPE
    training. explode(JVM regex pre-tokenizer) → hash-groupBy(word): the
    shuffle is bounded by distinct word types after map-side combine."""
    return (
        docs.select(
            F.explode(_pretokens_expr(F.col(text_col), lowercase)).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_loop(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE over a word histogram with incremental pair-count
    maintenance (only words containing the merged pair are touched).
    Deterministic: best pair = highest summed frequency, ties broken by
    lexicographically smallest (left, right)."""
    words = [list(w) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best, best_count = None, 0
        for p, c in pair_counts.items():
            if c > best_count or (c == best_count and best is not None and p < best):
                best, best_count = p, c
        if best is None or best_count <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in sorted(pair_words.pop(best, ())):
            syms, f = words[i], freqs[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += f
                pair_words[p].add(i)
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    lowercase: bool = True,
    max_word_types: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the ordered
    merge list (rank = position). The histogram collect is bounded by
    ``max_word_types`` (taken count DESC, word ASC — deterministic); the
    exact distributed histogram plus a pure-function driver loop make the
    result independent of partitioning."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if max_word_types < 1:
        raise ValueError(f"max_word_types must be >= 1, got {max_word_types}")
    hist = bpe_word_histogram(docs, text_col=text_col, lowercase=lowercase)
    rows = (
        hist.orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_word_types)
        .collect()
    )
    return _merge_loop([(r.word, r.freq) for r in rows], num_merges)


def merges_table(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list as a DataFrame (rank, left, right, token) — the engine's
    exchange format for a learned vocabulary (sinkable, joinable,
    golden-lockable)."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, token string"
    )


def merges_from_table(table: DataFrame) -> list[tuple[str, str]]:
    """Inverse of merges_table: load a persisted vocabulary back into the
    ordered merge list (rank gaps are tolerated — order is what matters;
    duplicate ranks are rejected because merge order would be ambiguous)."""
    rows = table.select("rank", "left", "right").orderBy("rank").collect()
    ranks = [r["rank"] for r in rows]
    if len(set(ranks)) != len(ranks):
        raise ValueError("duplicate rank values make the merge order ambiguous")
    return [(r["left"], r["right"]) for r in rows]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy encode: repeatedly find the present pair with the
    LOWEST merge rank and merge all its occurrences left-to-right."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best: tuple[str, str] | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        out: list[str] = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                out.append(best[0] + best[1])
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def with_bpe_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list → array<string> of
    subword tokens. Pre-tokenization stays JVM-side (the same regex the
    histogram used — ONE tokenizer end to end); the pandas UDF only applies
    merges, with a per-batch word→tokens cache so Python work is bounded by
    distinct words per batch. ``merges`` rides the closure → broadcast to
    executors once (num_merges entries)."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merges(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(ws) -> list[str]:
            out: list[str] = []
            for w in ws:
                toks = cache.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        return words.apply(enc)

    return docs.withColumn(
        out_col, apply_merges(_pretokens_expr(F.col(text_col), lowercase))
    )
