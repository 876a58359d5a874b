"""Unit tests: unigram-LM (SentencePiece-model) tokenizer — seed counts,
exact argmin segmentation, hard-EM training, distributed apply."""

from __future__ import annotations

import itertools

import pytest

from datalake_nba_dmc_spark.operators.unigram_lm import (
    MAX_WORD_LEN_EXACT,
    UNK,
    best_segmentation,
    seed_piece_counts,
    train_unigram,
    unigram_segment_counts,
)


def _brute_force(word: str, costs: dict[str, int]):
    """Reference argmin by full itertools enumeration of cut points."""
    n = len(word)
    best = None
    for mask in itertools.product([0, 1], repeat=max(0, n - 1)):
        cuts = [0] + [i + 1 for i, b in enumerate(mask) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(p not in costs for p in pieces):
            continue
        key = (sum(costs[p] for p in pieces), " ".join(pieces))
        if best is None or key < best[:2]:
            best = (key[0], key[1], pieces)
    return (best[0], best[2]) if best else None


def test_best_segmentation_matches_brute_force():
    costs = {"a": 10, "b": 12, "ab": 15, "ba": 9, "abb": 40, "bb": 5}
    for word in ("a", "ab", "abb", "abba", "bbbb", "ababab", "abbabbab"):
        assert best_segmentation(word, costs) == _brute_force(word, costs), word


def test_best_segmentation_tie_breaks_on_path_string():
    # two segmentations with IDENTICAL cost: 'ab c' (5+7) vs 'a bc' (7+5)
    costs = {"ab": 5, "c": 7, "a": 7, "bc": 5}
    cost, path = best_segmentation("abc", costs)
    assert cost == 12
    assert path == ["a", "bc"]  # 'a bc' < 'ab c' (space sorts below 'b')


def test_best_segmentation_uncovered_and_guard():
    assert best_segmentation("xyz", {"x": 1, "y": 1}) is None  # no 'z'
    with pytest.raises(ValueError):
        best_segmentation("a" * (MAX_WORD_LEN_EXACT + 1), {"a": 1})


def test_seed_piece_counts_weighted(spark):
    wf = spark.createDataFrame([("aba", 3), ("ab", 2)], "word string, freq long")
    got = {r["piece"]: r["n"] for r in seed_piece_counts(wf, max_piece_len=2).collect()}
    # 'a': 2 per 'aba' ×3 + 1 per 'ab' ×2 = 8; 'ab': 3+2=5; 'ba': 3; 'b': 3+2=5
    assert got == {"a": 8, "b": 5, "ab": 5, "ba": 3, "aba": 0} or got == {
        "a": 8, "b": 5, "ab": 5, "ba": 3,
    }


def test_train_unigram_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "spark join window " * 3 + "customer stream") for i in range(20)],
        "doc_id long, text string",
    )
    pieces = train_unigram(docs, vocab_size=20, max_piece_len=3, n_iters=2)
    table = dict(pieces)
    # coverage: every corpus character survives as a single-char piece
    chars = set("sparkjoinwindowcustomerstream")
    assert chars <= {p for p in table if len(p) == 1}
    assert len(pieces) <= 20 + 0 or len(pieces) >= len(chars)
    # deterministic retrain
    assert train_unigram(docs, vocab_size=20, max_piece_len=3, n_iters=2) == pieces
    # every corpus word segments completely under the trained table
    for w in ("spark", "join", "window", "customer", "stream"):
        assert best_segmentation(w, table) is not None


def test_unigram_segment_counts_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ba"), (2, "ab zz")], "doc_id long, text string"
    )
    pieces = [("ab", 5), ("a", 9), ("b", 9), ("ba", 5)]
    got = {r["piece"]: r["n"] for r in unigram_segment_counts(docs, pieces).collect()}
    # 'ab' ×3 (freq-weighted), 'ba' ×1, 'zz' uncovered → UNK ×1
    assert got == {"ab": 3, "ba": 1, UNK: 1}
