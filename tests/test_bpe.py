"""BPE tokenizer-prep: distributed pair counts vs a Python reference,
merge training vs Sennrich's regex-based reference algorithm, segmentation
invariants, and the driver-collect guard."""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import bpe as B

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def _ref_word_freq(texts):
    c = collections.Counter()
    for t in texts:
        c.update(t.lower().split())
    return dict(c)


def _ref_pair_counts(word_freq):
    pairs = collections.Counter()
    for w, f in word_freq.items():
        syms = list(w[:-1]) + [w[-1] + "</w>"]
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += f
    return {f"{a} {b}": n for (a, b), n in pairs.items()}


def _ref_bpe_merges(word_freq, n_merges):
    """Sennrich et al. 2016 reference formulation: vocab as space-joined
    symbol strings, merges applied by regex replacement."""
    vocab = {
        " ".join(list(w[:-1]) + [w[-1] + "</w>"]): f for w, f in word_freq.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, freq in vocab.items():
            syms = word.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        vocab = {
            pat.sub(a + b, word): freq for word, freq in vocab.items()
        }
    return merges


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_pair_counts_match_python_reference(spark, docs):
    got = {r["pair"]: r["n"] for r in B.pair_counts(B.word_freq_table(docs)).collect()}
    want = _ref_pair_counts(_ref_word_freq(CORPUS))
    assert got == want


def test_train_bpe_merges_matches_sennrich_reference(spark, docs):
    want = _ref_bpe_merges(_ref_word_freq(CORPUS), 12)
    got = B.train_bpe_merges(docs, n_merges=12)
    assert got == want
    assert len(got) >= 5  # corpus supports a real merge sequence


def test_bpe_segment_invariants(spark, docs):
    merges = B.train_bpe_merges(docs, n_merges=8)
    rows = B.bpe_segment(docs, merges).select("text", "bpe_tokens").collect()
    for r in rows:
        toks = r["bpe_tokens"]
        # concatenating subwords and stripping the end-of-word markers
        # reproduces the lowercased text exactly
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == " ".join(r["text"].lower().split())
        # every word boundary carries exactly one </w>
        assert sum(t.count("</w>") for t in toks) == len(r["text"].split())
    # the most frequent word collapses to a single token after training
    seg = B.bpe_segment(
        spark.createDataFrame([(1, "newest")], "doc_id long, text string"), merges
    ).first()["bpe_tokens"]
    assert seg == ["newest</w>"]


def test_train_bpe_vocab_guard(spark, docs):
    with pytest.raises(ValueError, match="vocabulary exceeds"):
        B.train_bpe_merges(docs, n_merges=2, max_vocab_rows=2)


def test_word_freq_min_freq_prunes(spark, docs):
    wf = {r["word"]: r["freq"] for r in B.word_freq_table(docs, min_freq=4).collect()}
    assert wf == {"low": 5, "newest": 6}
