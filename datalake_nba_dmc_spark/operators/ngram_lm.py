"""Bigram language-model quality scoring — the second-order upgrade of
``text.unigram_logprob``.

CCNet-style corpus filtering scores documents by their likelihood under a
background LM; a unigram model misses word-ORDER gibberish ("the of and
to a" scores beautifully), so production quality gates add a conditional
term. This module scores each document by its average add-one-smoothed
bigram log-probability under the corpus's OWN bigram distribution:

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

with ``c(w1 w2)`` the corpus bigram count, ``c(w1 ·)`` the count of
``w1`` as a bigram CONTEXT (so the smoothed distribution sums to exactly
1 over the V-word vocabulary), and ``V`` the corpus-wide distinct-token
count. Laplace smoothing keeps every quantity an exact INTEGER until one
``ln`` per distinct bigram — and that per-bigram micro-nat term
``round(ln(·) · 1e6)`` is an exact int64, so the per-document sums are
associative/order-free and a DuckDB twin replays them bit-exactly (the
``unigram_logprob`` determinism contract, extended one order up).

Scale shape (the 100 TB plan):

1. One explode of ZIPPED token-slice pairs → hash-agg to per-(doc, w1,
   w2) counts (map-side combined): shuffled rows are O(distinct (doc,
   bigram)), never O(token instances).
2. The (doc, bigram) counts checkpoint once (they are both the model's
   substrate and the scoring stream — see the in-function r16 note);
   corpus bigram counts are one further hash-agg, the context count is a
   window over the model-grain rows (partition sizes bounded by the
   per-context vocabulary), and the vocabulary size rides in as a
   broadcast one-row literal.
3. The model join back to per-doc rows is a plain equi-join on
   (w1, w2) — AQE's skew-join owns hot bigrams ("of the") exactly as it
   owns hot words in the unigram path.

Driver query ``text_bigram_logprob`` (registered r11); the DuckDB twin
(tests/test_staged_oracles.py and the suite oracle) builds bigrams with
a list comprehension over the token array and replays the same integer
micro-nat terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.util import ensure_parallelism


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document add-one bigram log-probability under the corpus's
    own bigram LM. Returns (``id_col``, ``n_bigrams``,
    ``sum_logprob_micro``) for every document with >= 2 tokens (a
    0/1-token document has no bigrams and is dropped, like the twin's
    length filter). The output is PURE integers: ``sum_logprob_micro``
    is the exact int64 sum of per-bigram micro-nat terms — no final
    float division. A first cut emitted ``round(mean, 6)`` and the
    sf0.1 cross-scale spot-run caught 2/5000 docs landing on a 6th-
    decimal rounding boundary where Spark's BigDecimal HALF_UP and
    DuckDB's round() disagree on the same double (the r7 lesson,
    re-learned: keep oracle-checked outputs integer to the end; the
    mean is one division away for any consumer)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
    )
    # vocabulary over ALL tokens (including 1-token docs' — the smoothing
    # denominator is a corpus property, not a bigram-stream property)
    vocab_size = (
        ensure_parallelism(df)
        .select(F.explode(toks).alias("_w"))
        .agg(F.count_distinct("_w").alias("v"))
    )
    pairs = (
        base.withColumn("_w1s", F.slice("_t", 1, F.size("_t") - 1))
        .withColumn("_w2s", F.slice("_t", 2, F.size("_t") - 1))
        .select(id_col, F.explode(F.arrays_zip("_w1s", "_w2s")).alias("_p"))
        .select(
            id_col,
            F.col("_p._w1s").alias("w1"),
            F.col("_p._w2s").alias("w2"),
        )
    )
    # r16: dbb is the model's substrate AND the scoring stream — left
    # lazy, Catalyst re-derived the whole zip-explode+agg pipeline three
    # times (join left, `big`'s input, `ctx`'s input via `big`; no
    # cross-subtree CSE), i.e. three tokenizations of the corpus. One
    # eager checkpoint pins it (the materialized rows are exactly what
    # the old plan shuffled three times anyway), and the context count
    # rides a window over the MODEL-grain rows — partition sizes are
    # bounded by the per-context vocabulary (distinct w2 per w1), not by
    # token instances, so a hot context stays one model row per follower
    # and AQE's skew join still owns the scoring join below. Same exact
    # integers (c_w1 = Σ_w2 c_ww); interleaved A/B min-of-6 at sf0.1:
    # 1.75 → 1.51 s, bit-identical (exceptAll symdiff 0).
    dbb = (
        pairs.groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("n_dbb"))
        .localCheckpoint(eager=True)
    )
    big = dbb.groupBy("w1", "w2").agg(F.sum("n_dbb").alias("c_ww"))
    bigc = big.withColumn(
        "c_w1", F.sum("c_ww").over(Window.partitionBy("w1"))
    )
    term = F.round(
        F.log(
            (F.col("c_ww") + 1).cast("double")
            / (F.col("c_w1") + F.col("v")).cast("double")
        )
        * 1e6
    ).cast("long")
    return (
        dbb.join(bigc, on=["w1", "w2"])
        .crossJoin(F.broadcast(vocab_size))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n_dbb") * term).alias("sum_logprob_micro"),
            F.sum("n_dbb").alias("n_bigrams"),
        )
        .select(id_col, "n_bigrams", "sum_logprob_micro")
    )
