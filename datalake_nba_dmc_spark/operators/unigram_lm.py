"""Unigram-LM subword tokenizer (SentencePiece's default model — Kudo
2018, "Subword Regularization"), the second tokenizer family next to BPE
(`operators/bpe.py`): instead of greedy merges, pieces carry unigram
log-probs and a word segments to its MINIMUM-COST piece sequence.

Same distributed/driver split as BPE (the split every production trainer
uses): corpus-scale statistics — the word-frequency table and the seed
substring counts — are Spark aggregations with map-side combine, while
the vocab-scale EM loop runs on the driver over the collected,
fail-fast-capped word table (`bpe.MAX_VOCAB_ROWS` guard). Segmentation
applies the trained table once per DISTINCT word (Arrow batches over the
word-frequency table), never per token instance.

Determinism contract (what makes the suite query oracle-checkable): piece
costs are integer micro-nats, and the best segmentation is the exact
argmin over ALL complete segmentations of ``(total_cost,
space-joined-path)`` — a total order both engines can compute literally
(space sorts below every printable piece character, so string comparison
equals piece-tuple comparison). Exhaustive enumeration is exponential in
word length, so words longer than :data:`MAX_WORD_LEN_EXACT` are
rejected up front (this corpus maxes at 8 chars; a production tokenizer
would swap the argmin for Viterbi DP and give up the cross-engine
tie-break guarantee, not the result). Hard-EM (Viterbi counts) stands in
for SentencePiece's full forward-backward E-step — a documented
simplification that keeps every statistic integer-exact.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.bpe import MAX_VOCAB_ROWS, word_freq_table
from datalake_nba_dmc_spark.operators.util import ensure_parallelism

#: Exhaustive-argmin guard: ≤ 2^(n-1) candidate segmentations per word.
MAX_WORD_LEN_EXACT = 16

#: Out-of-vocabulary marker for words whose characters the piece table
#: cannot cover (can't happen when the table was trained on the same
#: corpus family, but both engines implement the same fallback).
UNK = "<unk>"


def seed_piece_counts(
    word_freq: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """Frequency-weighted counts of EVERY substring up to
    ``max_piece_len`` over the word-frequency table — the unigram-LM seed
    vocabulary statistic. Pure expressions: per word, substrings come
    from a bounded ``transform(sequence)`` nest (no self-joins), then one
    explode + map-side-combined hash-agg. Returns (piece, n)."""
    w = F.col("word")
    n = F.length(w)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n)),
            lambda l: F.transform(
                F.sequence(F.lit(1), n - l + 1),
                lambda i: F.substring(w, i, l),
            ),
        )
    )
    return (
        word_freq.filter(n > 0)
        .select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def best_segmentation(
    word: str, costs: dict[str, int]
) -> tuple[int, list[str]] | None:
    """Exact argmin over all complete segmentations of ``word`` into
    pieces from ``costs`` (integer micro-nat costs), ordered by
    ``(total_cost, space-joined path)``. Returns None when no complete
    segmentation exists (an uncovered character)."""
    if len(word) > MAX_WORD_LEN_EXACT:
        raise ValueError(
            f"word longer than {MAX_WORD_LEN_EXACT} chars: exhaustive "
            "argmin would be exponential; pre-split or raise the guard"
        )
    max_len = max((len(p) for p in costs), default=0)
    best: tuple[int, str, list[str]] | None = None
    stack: list[tuple[int, int, list[str]]] = [(0, 0, [])]
    while stack:
        pos, cost, path = stack.pop()
        if pos == len(word):
            key = (cost, " ".join(path))
            if best is None or (key < (best[0], best[1])):
                best = (cost, key[1], path)
            continue
        for length in range(1, min(max_len, len(word) - pos) + 1):
            piece = word[pos : pos + length]
            c = costs.get(piece)
            if c is not None:
                stack.append((pos + length, cost + c, path + [piece]))
    if best is None:
        return None
    return best[0], best[2]


def train_unigram(
    df: DataFrame,
    vocab_size: int = 64,
    max_piece_len: int = 4,
    n_iters: int = 3,
    seed_size: int = 512,
    text_col: str = "text",
    max_vocab_rows: int | None = None,
) -> list[tuple[str, int]]:
    """Train the piece table: distributed word-frequency + seed-substring
    aggregations, then driver-side hard-EM over the capped word table.

    Each iteration: (E) segment every distinct word by the current costs
    and accumulate frequency-weighted piece usage; (M) keep all single
    characters (coverage) plus the top multi-char pieces by (usage desc,
    piece asc) up to ``vocab_size``, and reset costs to add-one-smoothed
    negative log-probs in integer micro-nats. Deterministic end to end:
    every tie in seeding, pruning, and segmentation breaks on the piece
    string.

    Returns [(piece, cost_micro)] sorted by (cost, piece) — cost_micro =
    round(-ln(p) * 1e6).
    """
    cap = MAX_VOCAB_ROWS if max_vocab_rows is None else max_vocab_rows
    wf = word_freq_table(df, text_col)
    rows = wf.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"train_unigram: vocabulary exceeds {cap:,} rows; raise min_freq"
        )
    words = {r["word"]: int(r["freq"]) for r in rows if r["word"]}
    seed_rows = (
        seed_piece_counts(wf, max_piece_len).limit(4 * cap + 1).collect()
    )
    if len(seed_rows) > 4 * cap:
        # Mirror the word-table guard: an unordered limit() past the cap
        # would truncate NONDETERMINISTICALLY and silently break the
        # bit-for-bit training contract (r8 ADVICE).
        raise ValueError(
            f"train_unigram: seed-substring vocabulary exceeds {4 * cap:,} "
            "rows; raise min_freq or lower max_piece_len"
        )
    seed = {r["piece"]: int(r["n"]) for r in seed_rows}
    singles = {p for p in seed if len(p) == 1}

    def to_costs(counts: dict[str, int], kept: set[str]) -> dict[str, int]:
        total = sum(counts.get(p, 0) for p in kept) + len(kept)  # add-one
        return {
            p: round(-math.log((counts.get(p, 0) + 1) / total) * 1e6)
            for p in kept
        }

    n_multi = max(0, vocab_size - len(singles))
    multi = sorted(
        (p for p in seed if len(p) > 1), key=lambda p: (-seed[p], p)
    )[: seed_size]
    kept = singles | set(multi[:n_multi])
    costs = to_costs(seed, kept)

    for _ in range(n_iters):
        usage: dict[str, int] = {}
        for w, f in sorted(words.items()):
            res = best_segmentation(w, costs)
            if res is None:  # uncovered char: skip — singles survive the
                continue     # prune unconditionally, so no usage is lost
            for p in res[1]:
                usage[p] = usage.get(p, 0) + f
        multi_used = sorted(
            (p for p in kept if len(p) > 1 and usage.get(p, 0) > 0),
            key=lambda p: (-usage[p], p),
        )[:n_multi]
        kept = singles | set(multi_used)
        costs = to_costs(usage, kept)
    return sorted(costs.items(), key=lambda kv: (kv[1], kv[0]))


def unigram_segment_counts(
    df: DataFrame,
    pieces: list[tuple[str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained piece table corpus-wide and count every emitted
    piece, weighted by word frequency — the unigram-LM twin of the BPE
    apply query. The corpus collapses to the word-frequency table first
    (one explode + hash-agg), the argmin segmentation runs once per
    DISTINCT word in Arrow batches with the piece table as a plan-literal
    closure, and the final agg is O(vocab) rows. Words with uncovered
    characters emit :data:`UNK`. Returns (piece, n)."""
    costs = dict(pieces)

    @F.pandas_udf("array<string>")
    def seg(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            res = best_segmentation(w or "", costs) if w else None
            out.append(res[1] if res else [UNK])
        return pd.Series(out)

    wf = word_freq_table(ensure_parallelism(df), text_col)
    return (
        wf.withColumn("_pieces", seg(F.col("word")))
        .select(F.explode("_pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
