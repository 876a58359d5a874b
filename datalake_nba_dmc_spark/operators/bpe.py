"""Tokenizer-training prep: byte-pair-encoding statistics over a corpus
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public; the word-frequency-table formulation every
production BPE trainer uses).

Split of labor at 100 TB:

- The corpus-scale work — collapsing token instances into the
  word-frequency table, and counting weighted adjacent symbol pairs —
  is distributed DataFrame algebra (explode → hash-agg; pair generation
  is a codegen'd ``transform(sequence(...))`` over the word's own symbol
  array, so the blow-up is per-word length, never corpus-wide).
- The merge LOOP trains on the COLLECTED word-frequency table — vocab-
  bounded driver work, the same split SentencePiece/HF trainers use
  (they all train from word counts, not raw text). A fail-fast cap
  (:data:`MAX_VOCAB_ROWS`) keeps the collect bounded; corpora with
  bigger vocabularies should raise ``min_freq``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.text import tokens
from datalake_nba_dmc_spark.operators.util import ensure_parallelism

#: Hard cap on the driver-side word-frequency collect in
#: :func:`train_bpe_merges` — ~1M distinct words × ~40 B is tens of MB,
#: the sane edge for driver state. Real web corpora stay under this with
#: a modest ``min_freq`` (hapaxes dominate the tail and cannot win a
#: merge anyway).
MAX_VOCAB_ROWS = 1_000_000


def word_freq_table(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Corpus → (word, freq): lowercase whitespace words, one explode +
    hash-agg (map-side combined; shuffled rows are O(|vocab|))."""
    wf = (
        ensure_parallelism(df)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return wf.filter(F.col("freq") >= min_freq) if min_freq > 1 else wf


def _symbols(word: Column) -> Column:
    """A word's initial symbol array: its characters, with the last one
    marked by the BPE end-of-word suffix ``</w>`` (Sennrich's convention,
    so merges cannot cross word boundaries when segments re-join)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit("</w>"))).otherwise(c),
    )


def pair_counts(word_freq: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over the word-frequency table —
    the statistic a BPE merge step maximizes. Pure expressions: pairs come
    from ``transform(sequence(0, size-2))`` over each word's symbol array
    (length-bounded, no self-join), then explode + hash-agg weighted by
    word frequency. Returns (pair, n) with ``pair = 'a b'``."""
    syms = _symbols(F.col("word"))
    staged = word_freq.select("freq", syms.alias("_syms")).filter(
        F.size("_syms") >= 2
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("_syms") - 2),
        lambda i: F.concat(
            F.element_at(F.col("_syms"), i + 1),
            F.lit(" "),
            F.element_at(F.col("_syms"), i + 2),
        ),
    )
    return (
        staged.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def train_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab_rows: int | None = None,
) -> list[tuple[str, str]]:
    """Train a BPE merge list: distributed word-frequency table, then the
    classic greedy merge loop over the collected table (vocab-bounded
    driver work — see module docstring). Ties break on (count desc, pair
    lexicographic asc) so the merge list is deterministic cross-run.

    Returns up to ``n_merges`` merges as (left, right) symbol pairs, in
    training order; stops early when no pair occurs twice."""
    if max_vocab_rows is None:
        max_vocab_rows = MAX_VOCAB_ROWS
    wf = word_freq_table(df, text_col, min_freq)
    rows = wf.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"train_bpe_merges: vocabulary exceeds {max_vocab_rows:,} rows; "
            "raise min_freq (hapax words cannot win a merge anyway)"
        )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        w = r["word"]
        syms = tuple(list(w[:-1]) + [w[-1] + "</w>"]) if w else ()
        if syms:
            vocab[syms] = vocab.get(syms, 0) + int(r["freq"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + freq
        vocab = new_vocab
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained merge list to segment text into BPE subwords —
    map-only Arrow batches (the merge list is a plan-literal closure, the
    per-word merge loop is pure Python over short symbol lists)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w[:-1]) + [w[-1] + "</w>"] if w else []
        while len(syms) >= 2:
            cands = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
        return syms

    @F.pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return ensure_parallelism(df).withColumn(out_col, seg(F.col(text_col)))
