"""Text-analysis operators for LLM training-data pipelines (beyond-reference;
required by BASELINE.json's north star).

All hot-path expressions are built-in Spark SQL functions (JVM-side,
whole-stage codegen) — no Python UDFs: at 100 TB a row-at-a-time Python UDF
on a documents table is the difference between hours and weeks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.util import ensure_parallelism

#: Tiny per-language stopword marker lists for the n-gram/stopword heuristic
#: language ID. Real pipelines use fastText/CLD3; the heuristic keeps the
#: operator self-contained and oracle-checkable.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}

#: BPE-ish token pattern: runs of word chars OR single non-space symbols —
#: approximates subword pre-tokenization (GPT-2-style split on
#: letters/digits/punctuation classes).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (empty string → empty array, not [''])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-ish token count via regexp extraction (TOKEN_PATTERN).

    Group index 0 = whole match (the pattern has no capture groups; Spark's
    default idx=1 would error)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token counts, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio.

    These are the standard cheap filters (C4/Gopher-style rules) used to
    score web text before training. Pure column expressions → one codegen'd
    projection, no shuffle.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), 0))
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*LANG_MARKERS["en"]))
    )
    return ensure_parallelism(df).withColumns(
        {
            "n_chars_calc": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "mean_word_len": F.when(
                n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens
            ).otherwise(F.lit(None).cast("double")),
            "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0),
            "upper_ratio": F.when(n_chars > 0, n_upper / n_chars).otherwise(0.0),
            "stopword_ratio": F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text", alias: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits.

    Deterministic tie-break: language key order en < es < fr < de by hit
    count descending, then alphabetical. Entirely built-in functions
    (split + array_intersect-style filter), so it runs at scan speed.
    """
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))

    def marker_filter(markers: list[str]):
        # closure factory: a default-arg lambda changes arity and breaks
        # Spark's higher-order-function binding
        return lambda t: t.isin(*markers)

    scores = [
        F.struct(
            F.size(F.filter(toks, marker_filter(markers))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # array_max over structs orders by (hits, lang); invert lang for a
    # deterministic alphabetical tiebreak on equal hits → take max hits,
    # first alphabetical lang. We sort descending by hits then pick element 0
    # of the sorted array for full determinism.
    arr = F.array(*scores)
    best = F.array_sort(
        arr,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .otherwise(F.when(a["lang"] < b["lang"], -1).when(a["lang"] > b["lang"], 1).otherwise(0)),
    ).getItem(0)
    return ensure_parallelism(df).withColumn(
        alias, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Per-(document, term) TF-IDF as pure DataFrame algebra.

    explode(tokens) → term counts per doc (tf) → document frequency per
    term (df) → tf × ln(N / df). Two shuffles total — (doc, term) then
    (term) — both hash-partitioned on high-cardinality keys, so this scales
    as well as any word-count. ``min_df`` prunes the long tail of hapax
    terms before the join (the classic vocabulary-size control at 100 TB).
    Smooth-free idf (ln(N/df)) keeps the formula oracle-expressible.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # corpus size as a broadcast scalar, not a driver-side .first() — the
    # whole plan stays lazy/one job
    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= min_df
    )
    return (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tf_idf"),
        )
    )


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    out: str = "fps",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every char ``k``-gram of the normalized text, slide a
    window of ``w`` consecutive hashes, keep each window's minimum — the
    distinct minima are the document's fingerprint set. Guarantees any
    shared substring of length ≥ k+w-1 yields a shared fingerprint.

    Hashes are md5 hex strings compared lexicographically (so a DuckDB
    oracle can reproduce the selection exactly); swap for ``xxhash64`` +
    numeric min in production. Staged projections per the interpreted-HOF
    rule (see operators.dedup.with_shingles).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    staged = ensure_parallelism(df).withColumn("_nt", norm)
    n_grams = F.length("_nt") - (k - 1)
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.md5(F.col("_nt").substr(i, F.lit(k))),
        ),
    ).otherwise(F.array(F.md5(F.col("_nt"))))
    staged = staged.withColumn("_hs", grams).drop("_nt")
    n_wins = F.size("_hs") - (w - 1)
    wins = F.when(
        n_wins >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_wins, F.lit(1))),
            lambda j: F.array_min(F.slice(F.col("_hs"), j, w)),
        ),
    ).otherwise(F.array(F.array_min(F.col("_hs"))))
    return staged.withColumn(out, F.array_distinct(wins)).drop("_hs")


def fingerprint(col: Column | str, normalize: bool = True) -> Column:
    """Document fingerprint: 64-bit hash of normalized text.

    Normalization = lowercase + collapse whitespace — the standard exact-dup
    canonical form. ``xxhash64`` is Spark's built-in 64-bit hash (seeded,
    stable across runs/partitions).
    """
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(c)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap_chars: int = 64,
) -> DataFrame:
    """Split documents into fixed-width character chunks with overlap —
    the context-window packing step of a training pipeline. Emits
    ``(id, chunk_idx, chunk_text, chunk_len)``; empty documents emit no
    chunks.

    Shape: chunk START OFFSETS are a per-row ``sequence()`` (bounded by
    each doc's own length) fanned out with ``posexplode`` + a substring
    projection — all JVM expressions, no Python, no shuffle at all: chunking
    is embarrassingly row-local, and the output inherits the input
    partitioning. At 100 TB this is a map-only stage."""
    if chunk_chars <= overlap_chars:
        raise ValueError("chunk_chars must exceed overlap_chars")
    step = chunk_chars - overlap_chars
    c = F.col(text_col)
    offsets = F.sequence(F.lit(0), F.length(c) - 1, F.lit(step))
    return (
        df.filter(F.length(c) > 0)
        .select(
            F.col(id_col),
            c.alias("_t"),
            F.posexplode(offsets).alias("chunk_idx", "_off"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.substring(F.col("_t"), F.col("_off") + 1, chunk_chars).alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals: distinct-word
    ratio, top-word fraction, duplicate-2-gram fraction. High repetition
    marks boilerplate/spam for the curation gate.

    Shape: ONE map-only projection, zero shuffles. Tokens are STAGED as a
    real column before any lambda touches them (the with_shingles rule:
    interpreted HOFs have no CSE, so an inline ``tokens()`` subtree
    re-evaluates per element), and the per-doc mode is a run-length fold
    over the SORTED token array — the histogram never leaves the row, so
    no (doc, word) explode shuffle exists to dominate at corpus scale
    (measured 13 s → ~1 s at sf0.1 vs the explode+re-agg formulation).
    Ratios are integer divisions → bit-identical across engines."""
    tok_col = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tok_col) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(tok_col, i + 1), F.element_at(tok_col, i + 2)
        ),
    )

    # longest run in the sorted array == max word multiplicity (the mode
    # count); "" is a safe sentinel because tokens() filters empties
    def run_step(acc, w):
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            w.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_count = F.aggregate(
        F.array_sort(tok_col),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        run_step,
        lambda acc: acc["best"],
    )
    # coalesce: a NULL text has ZERO words (0-filled stats like the empty
    # doc), not NULL stats — keeps the report columns non-null and matches
    # the oracle twin's convention (robustness_audit `nulls` finding)
    n_words = F.coalesce(F.size(tok_col), F.lit(0)).cast("long")
    n_distinct = F.coalesce(F.size(F.array_distinct(tok_col)), F.lit(0)).cast("long")
    return (
        ensure_parallelism(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            id_col,
            n_words.alias("n_words"),
            n_distinct.alias("n_distinct_words"),
            F.when(n_words > 0, n_distinct / n_words.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("distinct_word_ratio"),
            F.when(n_words > 0, top_count / n_words.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("top_word_fraction"),
            F.when(
                F.size(tok_col) >= 2,
                1 - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_2gram_fraction"),
        )
    )


#: PII patterns shared with the DuckDB oracle: RE2- and Java-regex
#: compatible (no lookaround, no backrefs), leftmost-greedy in both.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9][0-9\-()]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace email / IPv4 / phone-shaped spans with typed placeholders —
    the standard pre-training scrub. A chain of ``regexp_replace`` calls
    (order matters: emails before phones so digits inside addresses are
    not half-eaten) — one codegen'd projection, map-only at any scale.
    Real pipelines add locale-specific patterns; the mechanism is this."""
    out = F.col(text_col)
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return df.withColumn(text_col, out)


def pack_token_bins(
    df: DataFrame,
    budget: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins: within each
    shard, documents fill bins greedily in a deterministic order; a doc
    starts in bin floor(tokens_before / budget) (boundary docs straddle —
    the standard approximation, since sequences are split at context
    boundaries downstream anyway).

    Scale shape: ONE running-sum window per shard — packing is
    per-shard-parallel exactly like per-worker packing in real training
    pipelines, never a global single-partition sort. Output adds
    ``n_tokens`` and ``bin_id``."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = token_count(F.col(text_col))
    return (
        df.select(id_col, shard_col, n_tokens.alias("n_tokens"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            shard_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.floor((F.col("_cum") - F.col("n_tokens")) / float(budget))
            .cast("long")
            .alias("bin_id"),
        )
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-distribution features: char count, distinct
    chars, and Shannon entropy in nats — the classic gibberish/boilerplate
    detector (natural prose sits ~4–4.5 nats; base64 blobs, repeated
    padding, and binary spill sit far outside that band).

    Runs as ONE Arrow-batched Pandas UDF projection — map-only, zero
    shuffle: the char histogram never leaves the row, so at 100 TB the
    operator costs exactly one corpus scan (the explode→groupBy(doc, char)
    formulation would shuffle a row per character).

    Cross-engine determinism (driver oracle): each histogram term is
    rounded to integer micro-nats BEFORE summing (``round(k·ln k · 1e6)``
    as int64), making the sum order-free and bit-stable; the final
    ``entropy = round(ln n − s/1e6/n, 6)`` is a fixed expression over
    those exact integers. Rounding-rule note: ``np.round`` is
    half-to-even while the DuckDB twin's ``round()`` is
    half-away-from-zero — the rules differ ONLY when the argument is an
    exact ``x.5`` double. For the micro-nat terms that requires
    ``k·ln(k)·1e6`` (``ln`` irrational for every integer k ≥ 2) to land
    exactly on a representable half — no 64-bit double within reach of
    k ≤ 2^40 does — and for the final 6-decimal round it requires the
    double nearest ``s/1e6/n`` to be an exact half at the 7th decimal,
    equally measure-zero; so the two rules are indistinguishable on any
    reachable input. Docs with no characters are dropped (matches
    the SQL twin, where no char rows exist to aggregate) — filtered on
    ``length(text) > 0`` BEFORE the UDF: an equivalent predicate on the
    UDF's output would be pushed back through the projection and evaluate
    the whole UDF twice (once for the filter, once for the projection);
    the input-side form pushes to the scan instead.
    """
    @F.pandas_udf("n_chars bigint, n_distinct_chars bigint, char_entropy_nats double")
    def ent(texts: pd.Series) -> pd.DataFrame:
        out = []
        for t in texts:
            if not t:
                out.append((0, 0, 0.0))
                continue
            _, counts = np.unique(list(t), return_counts=True)
            n = int(counts.sum())
            s = int(np.round(counts * np.log(counts) * 1e6).astype(np.int64).sum())
            e = float(np.round(np.log(n) - (s / 1e6) / n, 6))
            # Clamp to the information-theoretic bound [0, ln(distinct)]
            # AFTER quantization (identically in the DuckDB twin), so
            # 0 <= H <= ln(d) + 5e-7 is a theorem, not a tolerance: the
            # micro-nat rounding can otherwise push H past ln(d) by up to
            # ~d/(2e6·n) + 5e-7 (Hypothesis example 'aa  \n\nbb').
            e = min(max(e, 0.0), float(np.round(np.log(len(counts)), 6)))
            out.append((n, len(counts), e))
        return pd.DataFrame(out, columns=["n_chars", "n_distinct_chars", "char_entropy_nats"])

    return (
        ensure_parallelism(df.filter(F.length(text_col) > 0))
        .withColumn("_ce", ent(F.col(text_col)))
        .select(*df.columns, "_ce.*")
    )


def collocations(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Bigram collocation mining by pointwise mutual information:
    ``pmi = ln(P(w1,w2) / (P(w1)·P(w2)))`` over adjacent lowercase token
    pairs — the classic corpus-exploration signal for multiword
    expressions ("new york"-style units a tokenizer or stopword list
    should know about).

    Word-count scale shape: one explode → hash-agg per arity (unigram,
    bigram; both map-side combined), the two grand totals broadcast as
    one-row literals, and the PMI projection is a fixed double expression
    over exact integer counts (one ``ln`` per surviving row, rounded to 6
    decimals — same cross-engine determinism treatment as TF-IDF).
    ``min_count`` prunes the long tail before the unigram joins.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    t = ensure_parallelism(df).select(toks.alias("toks"))
    uni = t.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    n_toks = uni.agg(F.sum("c").alias("n_toks"))
    pairs = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.*")
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    n_pairs = big.agg(F.sum("c_xy").alias("n_pairs"))
    joined = (
        big.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), on="w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), on="w2")
        .crossJoin(F.broadcast(n_toks))
        .crossJoin(F.broadcast(n_pairs))
    )
    pmi = F.round(
        F.log(
            (F.col("c_xy").cast("double") * F.col("n_toks") * F.col("n_toks"))
            / (F.col("n_pairs").cast("double") * F.col("c_x") * F.col("c_y"))
        ),
        6,
    )
    return joined.select("w1", "w2", "c_xy", pmi.alias("pmi"))


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, appendix A —
    public paper): the battery of cheap structural filters applied to web
    text before LLM training, beyond the ratio features of
    :func:`quality_features`. Adds per-doc signals and a conjunctive
    ``gopher_pass`` verdict:

    - ``n_words`` in [50, 100 000]
    - ``mean_word_chars`` (exact: Σ token lengths / n_words) in [3, 10]
    - ``symbol_word_ratio`` (words containing ``#`` or ``...``) < 0.1
    - ``bullet_line_frac`` (lines starting with ``-``/``*``/``•``) < 0.9
    - ``ellipsis_line_frac`` (lines ending with ``...``) < 0.3
    - ``alpha_word_frac`` (words containing a letter) > 0.8
    - ``n_stop_hits`` (of the/be/to/of/and/that/have/with) ≥ 2

    Pure built-in expressions (split/filter/aggregate) → one codegen'd
    map-only projection the scan absorbs; no UDF, no shuffle. All ratios
    are exact-int divisions, so both engines produce identical doubles.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, v: a + v
    )
    n_symbol = F.size(F.filter(toks, lambda t: t.contains("#") | t.contains("...")))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stops)))
    lines = F.filter(F.split(c, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))
    )
    n_ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).rlike("\\.\\.\\.$")))
    mean_chars = F.when(n_words > 0, sum_len / n_words)
    symbol_ratio = F.when(n_words > 0, n_symbol / n_words).otherwise(0.0)
    alpha_frac = F.when(n_words > 0, n_alpha / n_words).otherwise(0.0)
    bullet_frac = F.when(n_lines > 0, n_bullet / n_lines).otherwise(0.0)
    ellipsis_frac = F.when(n_lines > 0, n_ellipsis / n_lines).otherwise(0.0)
    gopher_pass = (
        n_words.between(50, 100_000)
        & mean_chars.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (alpha_frac > 0.8)
        & (n_stop >= 2)
    )
    # no ensure_parallelism: expression-only projection — parallelism comes
    # from the scan's own splits; a repartition here would only add an
    # Exchange (plan-asserted map-only in tests/test_plan_shape.py)
    return df.withColumns(
        {
            "n_words": n_words.cast("long"),
            "mean_word_chars": mean_chars,
            "symbol_word_ratio": symbol_ratio,
            "bullet_line_frac": bullet_frac,
            "ellipsis_line_frac": ellipsis_frac,
            "alpha_word_frac": alpha_frac,
            "n_stop_hits": n_stop.cast("long"),
            "gopher_pass": F.coalesce(gopher_pass, F.lit(False)).cast("int"),
        }
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's own
    unigram LM — the classic perplexity-style quality score (CCNet-style
    filtering uses exactly this shape: documents whose tokens are
    improbable under a background LM are gibberish/boilerplate).

    Word-count scale shape (the 100 TB plan):

    1. One explode → hash-agg to per-(doc, word) counts (map-side
       combined), then a second hash-agg to corpus word counts — shuffled
       rows are O(distinct (doc, word)), never O(token instances).
    2. The grand total rides in as a broadcast one-row literal; the
       vocabulary join is a plain equi-join on ``word`` (AQE handles hot
       words; the vocab side is orders of magnitude smaller than the
       corpus).
    3. Per-token term ``round(ln(c_w / T) · 1e6)`` is an exact int64, so
       the per-doc sum is associative/order-free; the final average is one
       fixed double expression rounded to 6 dp (same cross-engine
       treatment as TF-IDF/PMI).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    dw = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(toks).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("n_dw"))
    )
    vocab = dw.groupBy("w").agg(F.sum("n_dw").alias("c_w"))
    total = vocab.agg(F.sum("c_w").alias("t_total"))
    term = F.round(
        F.log(F.col("c_w").cast("double") / F.col("t_total").cast("double")) * 1e6
    ).cast("long")
    return (
        dw.join(vocab, on="w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n_dw") * term).alias("_s"),
            F.sum("n_dw").alias("n_tokens"),
        )
        .select(
            id_col,
            F.col("n_tokens"),
            F.round((F.col("_s") / 1e6) / F.col("n_tokens"), 6).alias("avg_logprob"),
        )
    )


def gram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    shingles that appear in NO other document (corpus document-frequency
    1) — high novelty marks genuinely fresh content, low novelty marks
    boilerplate/templated text, and for generated corpora it is the cheap
    memorization-risk screen (a "new" doc built from already-seen grams).

    Word-count scale shape: the shared shingle machinery
    (plans/curation.sized_gram_rows — one staged shingle evaluation,
    64-bit gram hashes) feeds one DF hash-agg and one equi-join back on
    the gram key; shuffled rows are O(distinct (doc, gram)), the same
    cost class as TF-IDF. Novelty is an exact int/int division. NULL-text
    docs are excluded up front — the shingle fallback would otherwise
    hand them one phantom empty-string gram (a doc with no text has zero
    shingles, and the SQL twin's gram join drops such docs anyway)."""
    from datalake_nba_dmc_spark.plans.curation import sized_gram_rows

    g = sized_gram_rows(df.filter(F.col(text_col).isNotNull()), text_col, id_col, shingle_n)
    dfreq = g.groupBy("gram").agg(F.count("*").alias("_df"))
    return (
        g.join(dfreq, on="gram")
        .groupBy(id_col)
        .agg(
            F.first("sz").cast("long").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long")).alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams")).alias("novelty"),
        )
    )


def sentence_boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_threshold: int = 3,
) -> DataFrame:
    """Per-document sentence-level boilerplate share: the fraction of a
    doc's distinct sentences that appear in more than ``df_threshold``
    documents corpus-wide — the sentence-grain complement of the shingle
    novelty screen (cookie banners, footers, templated disclaimers
    repeat as WHOLE sentences long before they dominate shingles).

    Sentences are ``[.!?]``-delimited trimmed segments (an RE2-safe split
    so the DuckDB twin tokenizes identically — no lookbehind). Shape:
    distinct (doc, sentence) rows → document-frequency hash agg on the
    sentence → join back on the sentence key → per-doc counts; shuffled
    rows are O(distinct (doc, sentence)), the TF-IDF cost class."""
    sent = (
        df.select(
            id_col,
            F.explode(F.split(F.col(text_col), r"[.!?]+")).alias("_raw"),
        )
        .select(id_col, F.trim(F.col("_raw")).alias("sentence"))
        .filter(F.col("sentence") != "")
        .distinct()
    )
    dfreq = sent.groupBy("sentence").agg(F.count("*").alias("_df"))
    return (
        sent.join(dfreq, on="sentence")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_sentences"),
            F.sum((F.col("_df") > df_threshold).cast("long")).alias("n_boiler"),
        )
        .select(
            id_col,
            "n_sentences",
            "n_boiler",
            F.round(
                F.col("n_boiler").cast("double") / F.col("n_sentences"), 6
            ).alias("boiler_share"),
        )
    )


def vocab_logit_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_col: str = "word",
    weight_col: str = "weight",
    bias: float = 0.0,
) -> DataFrame:
    """Model-based quality scoring with a linear bag-of-words classifier —
    the FineWeb-Edu / DCLM-style filter shape (public): a trained
    (word → weight) table scores each document as
    ``logit = bias + Σ_w weight(w) · count(w) / n_tokens``; downstream
    curation thresholds on the logit (the sigmoid is monotone, so
    thresholding the logit IS thresholding the probability — no
    transcendental in the hot path, no cross-engine exp() drift).

    Scale shape mirrors :func:`unigram_logprob`: one explode → hash-agg
    to per-(doc, word) counts (shuffled rows O(distinct (doc, word)),
    never O(token instances)), then a broadcast join against the weight
    table (a trained vocabulary is ~10⁵-10⁶ rows — broadcast-sized) and
    one per-doc sum. Determinism: weights quantize to 1e-6-scaled longs,
    so every partial product/sum is an exact int64 (associative,
    partitioning-free); ONE final double division, rounded to 6 dp.
    Out-of-vocabulary words contribute 0 (inner join semantics on the
    count rows, n_tokens still counts them). A word listed more than once
    in ``weights`` contributes the SUM of its coefficients (linear-model
    semantics for duplicate features) — collapsed before the join so the
    count rows never fan out."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    dw = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(toks).alias("_w"))
        .groupBy(id_col, "_w")
        .agg(F.count("*").alias("_n"))
    )
    wq = (
        weights.select(
            F.col(word_col).alias("_w"),
            F.round(F.col(weight_col).cast("double") * 1e6)
            .cast("long")
            .alias("_wt"),
        )
        .groupBy("_w")
        .agg(F.sum("_wt").alias("_wt"))
    )
    per_doc = (
        dw.join(F.broadcast(wq), on="_w", how="left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_n") * F.coalesce("_wt", F.lit(0))).alias("_s"),
            F.sum("_n").alias("n_tokens"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(
            F.lit(float(bias)) + (F.col("_s") / 1e6) / F.col("n_tokens"), 6
        ).alias("logit"),
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public): score every raw
    document by how much more likely its tokens are under the TARGET
    corpus's unigram LM than under the raw corpus's own LM —
    ``log p_T(doc) − log p_R(doc)``. Selecting the top-weighted documents
    shifts the training mix toward the target domain; this is the
    standard domain-targeted data-selection recipe (the paper hashes
    features to fit one machine — distributed, the vocabulary join
    needs no hashing).

    Estimation spec (pinned so the DuckDB twin is bit-identical):
    vocabulary = the RAW corpus's words; both LMs are Laplace(+1)
    smoothed over that vocabulary, ``p(w) = (c(w)+1) / (N + V)`` with
    ``N`` the corpus's token total restricted to the vocab and ``V`` the
    vocab size. Target-only words cannot appear in raw documents and are
    ignored. Each per-word log term is quantized to integer micro-nats
    BEFORE the per-doc sum (order-free, exact — the unigram_logprob
    pattern).

    Scale shape: explode → per-(doc, word) hash-agg (shuffled rows are
    O(distinct (doc, word)), never token instances); target word counts
    are a second independent agg; the two one-row totals ride in as a
    broadcast literal; the scoring join is a plain equi-join on ``word``.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    dw = (
        ensure_parallelism(raw)
        .select(F.col(id_col), F.explode(toks).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("n_dw"))
    )
    vocab_r = dw.groupBy("w").agg(F.sum("n_dw").alias("c_r"))
    tcounts = (
        ensure_parallelism(target)
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_t0"))
    )
    vocab = vocab_r.join(tcounts, on="w", how="left").select(
        "w", "c_r", F.coalesce("c_t0", F.lit(0)).alias("c_t")
    )
    totals = vocab.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    qlog_t = F.round(
        F.log(
            (F.col("c_t") + 1).cast("double")
            / (F.col("n_t") + F.col("v")).cast("double")
        )
        * 1e6
    ).cast("long")
    qlog_r = F.round(
        F.log(
            (F.col("c_r") + 1).cast("double")
            / (F.col("n_r") + F.col("v")).cast("double")
        )
        * 1e6
    ).cast("long")
    return (
        dw.join(vocab, on="w")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n_dw") * (qlog_t - qlog_r)).alias("_s"),
            F.sum("n_dw").alias("n_tokens"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("_s") / 1e6, 6).alias("dsir_logratio"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 document scores for ONE query (Robertson et al., TREC-3;
    idf in the Lucene "+1" form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` so
    scores stay positive for terms in more than half the corpus).

    The retrieval primitive of curation pipelines — eval-set contamination
    lookup, kNN data selection, report-style corpus search — expressed as
    pure DataFrame algebra:

    - tokenize once, keep per-doc length ``dl`` BEFORE the query-term
      filter (dl is a whole-document property);
    - ``term IN (query)`` prunes the exploded stream immediately — the
      only rows that ever reach a shuffle are (doc, query-term) hits, so
      corpus-scale cost is O(matching postings), not O(tokens);
    - per-term document frequencies are a ≤|query|-row aggregate joined
      back by broadcast; corpus stats (N, avgdl) are a one-row broadcast
      (bounded by construction — plan-census allowlisted);
    - one final hash agg by doc sums the ≤|query| per-term contributions.

    Returns (id_col, bm25) for every document with ≥1 matching term,
    ``bm25`` rounded to 6 dp (identical IEEE doubles in both engines —
    the tfidf rounding rule).
    """
    base = ensure_parallelism(df).select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
        F.col(text_col).isNotNull().alias("_has_text"),
    )
    stats = base.agg(
        F.countDistinct(id_col).cast("double").alias("n_docs"),
        F.avg(F.when(F.col("_has_text"), F.size("_toks"))).alias("avgdl"),
    )
    hits = (
        base.select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        .filter(F.col("term").isin(query_terms))
    )
    tf = hits.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    topk: int = 20,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 retrieval: scores from :func:`bm25_scores`, ordered by
    (bm25 DESC, id ASC — deterministic tiebreak on the 6-dp-rounded
    score), cut with ``limit`` so Catalyst compiles the selection to
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    id_col = kwargs.get("id_col", "doc_id")
    scores = bm25_scores(df, query_terms, **kwargs)
    return scores.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(topk)


def bm25_multiquery(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int | None = None,
) -> DataFrame:
    """Okapi BM25 over a queries TABLE (VERDICT r7 ask #5) — the shape a
    100 TB contamination/retrieval sweep actually runs: a retrieval
    *workload* is thousands of queries, not one Python list, and scoring
    them one `bm25_scores` call at a time would rescan the corpus per
    query. This form scans and tokenizes the corpus ONCE for the whole
    workload:

    - query terms are tokenized and de-duplicated per query (set
      semantics, matching :func:`bm25_scores`' ``isin``), and both the
      per-query term table and its distinct-term projection are tiny
      (≤ |queries|·|terms| rows) → broadcast;
    - the exploded corpus stream is pruned by a broadcast LEFT SEMI join
      on the distinct terms BEFORE any shuffle — only matching postings
      ever move, O(matching postings) like the single-query path;
    - per-(doc, term) tf and per-term df are computed once, SHARED across
      every query that contains the term (the whole point of batching);
    - fanning (doc, term, tf) out to (query, doc, term, tf) is a
      broadcast join against the query-terms table; one final hash agg by
      (query, doc) sums the contributions.

    With ``topk``, per-query top-k is cut by a rank window over
    (bm25 DESC, id ASC) that Catalyst compiles to WindowGroupLimit
    (per-partition heaps per query — no global sort; plan-asserted for
    the quota family in tests/test_plan_shape.py).

    Returns (query_id, doc_id, bm25[, rank]) for every (query, doc) pair
    with ≥1 matching term; bm25 rounded to 6 dp (the tfidf rule).
    """
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokens(F.lower(F.col(query_text_col)))).alias("term"),
        )
        .distinct()
    )
    terms = qterms.select("term").distinct()
    base = ensure_parallelism(df).select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
        F.col(text_col).isNotNull().alias("_has_text"),
    )
    stats = base.agg(
        F.countDistinct(id_col).cast("double").alias("n_docs"),
        F.avg(F.when(F.col("_has_text"), F.size("_toks"))).alias("avgdl"),
    )
    hits = base.select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    ).join(F.broadcast(terms), on="term", how="left_semi")
    tf = hits.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scores = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(F.broadcast(qterms), on="term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    if topk is None:
        return scores
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


def js_divergence(
    df: DataFrame,
    source_a: str,
    source_b: str,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Jensen–Shannon divergence between two sub-corpora's unigram
    distributions — the text-distribution twin of the numeric PSI drift
    check (and the standard "did my filter/generator shift the corpus"
    QC in curation pipelines). Returns ONE row
    (n_tokens_a, n_tokens_b, kl_a, kl_b, jsd) in nats, 6 dp.

    Engine-exact by the micro-nat integer trick (same as
    :func:`unigram_logprob`): each vocabulary term contributes
    ``count * round(ln(p/m) * 1e6)`` — a bigint product — so the corpus
    sums are order-free exact integers and only ONE final division
    happens in floating point. The log ratios are computed with an
    explicitly sequenced expression (``ln((2*(ca/ta)) / (ca/ta + cb/tb))``)
    so both engines evaluate identical IEEE operations.

    Plan: one token-level agg (map-side combined) pivots the two sources
    into (c_a, c_b) per token, a one-row totals broadcast, and a final
    one-row agg — shuffle cost O(|vocab|), corpus scanned once.
    """
    toks = ensure_parallelism(
        df.filter(F.col(source_col).isin([source_a, source_b]))
    ).select(
        source_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("_w")
    )
    counts = toks.groupBy("_w").agg(
        F.sum(F.when(F.col(source_col) == source_a, 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col(source_col) == source_b, 1).otherwise(0)).alias("_cb"),
    )
    totals = counts.agg(
        F.sum("_ca").cast("long").alias("_ta"), F.sum("_cb").cast("long").alias("_tb")
    )
    ca, cb = F.col("_ca").cast("double"), F.col("_cb").cast("double")
    ta, tb = F.col("_ta").cast("double"), F.col("_tb").cast("double")
    # identical operation order in the DuckDB twin — do not refactor
    log_a = F.log((F.lit(2.0) * (ca / ta)) / (ca / ta + cb / tb))
    log_b = F.log((F.lit(2.0) * (cb / tb)) / (ca / ta + cb / tb))
    term_a = F.when(
        F.col("_ca") > 0, F.col("_ca") * F.round(log_a * 1e6).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    term_b = F.when(
        F.col("_cb") > 0, F.col("_cb") * F.round(log_b * 1e6).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    kl_a = F.col("_sa").cast("double") / (F.col("_ta") * F.lit(1e6))
    kl_b = F.col("_sb").cast("double") / (F.col("_tb") * F.lit(1e6))
    return (
        counts.crossJoin(F.broadcast(totals))
        .agg(
            F.first("_ta").alias("_ta"),
            F.first("_tb").alias("_tb"),
            F.sum(term_a).cast("long").alias("_sa"),
            F.sum(term_b).cast("long").alias("_sb"),
        )
        .select(
            F.col("_ta").alias("n_tokens_a"),
            F.col("_tb").alias("n_tokens_b"),
            F.round(kl_a, 6).alias("kl_a"),
            F.round(kl_b, 6).alias("kl_b"),
            F.round((kl_a + kl_b) / F.lit(2.0), 6).alias("jsd"),
        )
    )


def c4_line_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line-level cleaning signals (Raffel et al. 2020, §2.2 —
    public paper; the reference pipeline behind the C4 corpus). Where
    :func:`gopher_quality` judges a DOCUMENT by ratio rules, C4 first
    cleans LINE BY LINE and then applies page-level discards:

    - a line is KEPT iff it ends in terminal punctuation (``. ! ? "``)
      AND has at least 5 words AND does not contain the word
      ``javascript`` (case-insensitive);
    - the page is DISCARDED if it has fewer than 3 kept "sentences"
      (kept lines, the paper's proxy), contains ``lorem ipsum``, or
      contains a curly brace (``{`` — code markup).

    Emitted per document: ``n_lines`` (non-blank), ``n_kept_lines``,
    ``kept_chars`` (Σ trimmed length of kept lines — the size of the
    cleaned page), ``has_lorem`` / ``has_brace`` (0/1), and the
    conjunctive ``c4_keep`` verdict. Pure built-in array expressions
    (split → filter → aggregate) — one codegen'd map-only projection the
    scan absorbs, no UDF, no shuffle, embarrassingly parallel at 100 TB.
    The three-sentence-span corpus dedup step of C4 lives separately in
    ``dedup.cross_doc_substring_spans`` (registered r9).

    Suite registration (``text_c4_filters``) is staged for the next
    round per the registry freeze; tests/test_staged_oracles.py carries
    the DuckDB twin (list_filter replay of the same line rules).
    """
    c = F.col(text_col)
    # STAGE the line arrays as real columns (the with_shingles rule):
    # higher-order functions are interpreted, and `_lines`/`_kept` are
    # each referenced by two output columns — inlined, the whole
    # split→trim→filter chain re-evaluates per reference (measured
    # 7.4 s → ~1 s at sf0.1 for this exact projection).
    staged = df.withColumn(
        "_lines",
        # explicit lambda, NEVER bare F.trim: pyspark dispatches HOF
        # callables on ARITY, and F.trim's optional second parameter
        # (col, trim=None) makes transform call it as trim(elem, idx) —
        # which strips literal '0'/'1'/... characters per line INDEX
        # instead of trimming whitespace (r12 nulls-audit finding on the
        # edge-string fixture; the clean corpus has no padded lines, so
        # every clean-data twin was blind to it)
        F.filter(
            F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ),
    ).withColumn(
        "_kept",
        F.filter(
            F.col("_lines"),
            lambda l: l.rlike('[.!?"]$')
            & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != "")) >= 5)
            & ~F.lower(l).contains("javascript"),
        ),
    )
    n_kept = F.size("_kept")
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    c4_keep = (n_kept >= 3) & ~has_lorem & ~has_brace
    return staged.withColumns(
        {
            "n_lines": F.size("_lines").cast("long"),
            "n_kept_lines": n_kept.cast("long"),
            "kept_chars": F.aggregate(
                F.transform(F.col("_kept"), F.length),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            ),
            "has_lorem": has_lorem.cast("int"),
            "has_brace": has_brace.cast("int"),
            "c4_keep": F.coalesce(c4_keep, F.lit(False)).cast("int"),
        }
    ).drop("_lines", "_kept")


def hashed_tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> DataFrame:
    """Feature-hashing ("hashing trick", Weinberger et al. 2009 — public)
    TF-IDF vectorization: every token occurrence folds into one of
    ``num_buckets`` feature buckets via the dialect-rendered mixer hash,
    so the feature space is FIXED-WIDTH regardless of vocabulary — the
    property that makes it the 100 TB text vectorizer (plain TF-IDF's
    feature dimension is the vocabulary: unbounded, skew-prone, and
    needing a global vocab build; hashed features need no vocabulary
    pass at all and collisions are the documented accuracy trade).

    → one row per (``id_col``, bucket) with ``tf`` (occurrences),
    ``bucket_df`` (distinct docs hitting the bucket), and
    ``tfidf_micro = tf · round(ln((N+1)/(bucket_df+1)) · 10^6)`` —
    exact int64 end to end (the bigram_logprob micro-nat contract; no
    float column anywhere, so the DuckDB twin hash-matches bit-exactly,
    where plain-TF-IDF twins need the 6-dp rounding rule). N counts
    DISTINCT contract documents with ≥ 1 token, so re-delivered
    (duplicated) corpora change tf uniformly without corrupting the IDF
    table. ASCII contract as in cms_counters (codepoint arithmetic must
    agree across UTF-16/UTF-8).

    Scale shape: one explode → ONE (doc, bucket) hash-agg (map-side
    combined; per-doc group count capped at num_buckets) → a ≤
    num_buckets-row IDF table re-aggregated from that frame and
    BROADCAST back. No vocabulary shuffle, no global sort."""
    from datalake_nba_dmc_spark.operators.cdc import token_hash_sql
    from datalake_nba_dmc_spark.operators.dedup import normalize_text

    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    th = token_hash_sql("tok", "spark")
    per_doc_bucket = (
        ensure_parallelism(
            df.filter(
                F.col(text_col).isNotNull()
                & (F.octet_length(text_col) == F.length(text_col))
            )
        )
        .select(F.col(id_col), F.explode(toks).alias("tok"))
        .select(
            id_col,
            (F.expr(th) % num_buckets).cast("long").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = per_doc_bucket.groupBy("bucket").agg(
        F.countDistinct(id_col).alias("bucket_df")
    )
    n_docs = per_doc_bucket.agg(
        F.countDistinct(id_col).alias("_n_docs")
    )
    return (
        per_doc_bucket.join(F.broadcast(idf), on="bucket")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "bucket",
            "tf",
            "bucket_df",
            (
                F.col("tf")
                * F.expr(
                    "CAST(round(ln(CAST(_n_docs + 1 AS DOUBLE) "
                    "/ CAST(bucket_df + 1 AS DOUBLE)) * 1000000.0) AS BIGINT)"
                )
            ).alias("tfidf_micro"),
        )
    )
