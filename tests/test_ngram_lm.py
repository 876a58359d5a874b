"""Bigram-LM quality scoring — exact-arithmetic laws + sequential replay."""

from __future__ import annotations

import math

import pytest


def _replay(rows: list[tuple[int, str]]) -> dict[int, tuple[int, float]]:
    """Sequential single-threaded reference implementation of the
    documented contract (independent of any engine)."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in rows if t}
    vocab = {w for ws in toks.values() for w in ws}
    v = len(vocab)
    big: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    ctx: dict[str, int] = {}
    for (a, _), c in big.items():
        ctx[a] = ctx.get(a, 0) + c
    out = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        s = n = 0
        for a, b in zip(ws, ws[1:]):
            # round-half-even matches Spark/DuckDB round() only away from
            # .5 boundaries; the term construction (ln of a ratio of
            # small ints) never lands exactly on .5 in these fixtures
            p = (big[(a, b)] + 1) / float(ctx[a] + v)
            s += int(round(math.log(p) * 1e6))
            n += 1
        out[i] = (n, s)
    return out


def test_bigram_logprob_matches_sequential_replay(spark):
    from datalake_nba_dmc_spark.operators.ngram_lm import bigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "mat the on sat cat the"),  # same unigrams as 1, scrambled
        (4, "one"),                      # 1 token → no bigrams → dropped
        (5, None),
        (6, ""),
        (7, "the cat sat on the mat"),   # exact dup of 1 → same score
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.sum_logprob_micro)
        for r in bigram_logprob(df).collect()
    }
    want = _replay(rows)
    assert got == want
    assert set(got) == {1, 2, 3, 7}
    # word ORDER matters now: the scrambled doc scores strictly worse
    # than its in-order twin (every unigram model scores them equal);
    # equal n_bigrams makes the micro-nat SUMS directly comparable
    assert got[3][0] == got[1][0] and got[3][1] < got[1][1]
    assert got[7] == got[1]


def test_bigram_logprob_empty_and_degenerate(spark):
    from datalake_nba_dmc_spark.operators.ngram_lm import bigram_logprob

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bigram_logprob(empty).collect() == []
    degenerate = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \t "), (4, "solo")], ["doc_id", "text"]
    )
    assert bigram_logprob(degenerate).collect() == []


def test_bigram_logprob_smoothing_sums_to_one(spark):
    """The add-one model is a PROPER conditional distribution: for a
    context w1, summing p(w2|w1) over the whole vocabulary gives exactly
    1 — (c(w1,·) + V) / (c(w1,·) + V). Checked symbolically on a tiny
    corpus via the model tables the operator implies."""
    from fractions import Fraction

    rows = [(1, "a b a c"), (2, "b a b")]
    toks = {i: t.split() for i, t in rows}
    vocab = sorted({w for ws in toks.values() for w in ws})
    v = len(vocab)
    big: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    for w1 in vocab:
        c1 = sum(c for (a, _), c in big.items() if a == w1)
        total = sum(
            Fraction(big.get((w1, w2), 0) + 1, c1 + v) for w2 in vocab
        )
        assert total == 1
