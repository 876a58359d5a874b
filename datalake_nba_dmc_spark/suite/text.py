"""Text-analysis queries over the documents table (north-star extension ops).

tfidf note: both engines compute ln() on identical IEEE doubles but may
differ in the last ulp (different libm implementations), so the tf_idf
measure is rounded to 6 dp on BOTH sides before hashing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import text as T
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.operators.sampling import duck_key_hash
from datalake_nba_dmc_spark.suite import query

# DuckDB-side normalized whitespace token list (matches operators.text.tokens).
_DUCK_TOKS = (
    "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"
)


@query(
    "text_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n_chars_calc,
             len({_DUCK_TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
             len(list_filter({_DUCK_TOKS},
                             x -> lower(x) IN ('the','and','of','to','a'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CASE WHEN n_tokens > 0
                THEN (n_chars_calc - (n_tokens - 1)) / n_tokens END AS mean_word_len,
           CASE WHEN n_chars_calc > 0 THEN n_punct / n_chars_calc ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_chars_calc > 0 THEN n_upper / n_chars_calc ELSE 0.0 END AS upper_ratio,
           CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stopword_ratio
    FROM t
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features (C4/Gopher-style cheap filters): lengths,
    token counts, punctuation/uppercase/stopword ratios — all built-in
    expressions, one codegen'd projection."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.quality_features(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "mean_word_len",
        "punct_ratio", "upper_ratio", "stopword_ratio",
    )


def _duck_lang_hits(markers: list[str]) -> str:
    # COALESCE: NULL text must score 0 hits (-> 'und'), not fall through
    # every CASE arm to the last language
    lst = ",".join(f"'{m}'" for m in markers)
    return f"COALESCE(len(list_filter({_DUCK_TOKS}, x -> lower(x) IN ({lst}))), 0)"


@query(
    "text_lang_id",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {_duck_lang_hits(T.LANG_MARKERS['de'])} AS h_de,
             {_duck_lang_hits(T.LANG_MARKERS['en'])} AS h_en,
             {_duck_lang_hits(T.LANG_MARKERS['es'])} AS h_es,
             {_duck_lang_hits(T.LANG_MARKERS['fr'])} AS h_fr
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM h
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-marker language ID with deterministic alphabetical
    tiebreak (de<en<es<fr)."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.lang_id(docs).select("doc_id", "lang_pred")


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint over normalized text. md5 here because DuckDB
    can oracle it; the production path is the 64-bit ``xxhash64`` variant
    (operators.text.fingerprint) used by exact dedup."""
    docs = TableRegistry(spark, sf_dir).documents
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fp"))


@query(
    "text_token_histogram",
    oracle=f"""
    SELECT token, COUNT(*) AS token_count
    FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
    GROUP BY token
    """,
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency: explode → hash agg (the map-side-combine
    wordcount shape; at 100 TB the explode stays pipelined into the partial
    aggregate — no intermediate materialization)."""
    docs = TableRegistry(spark, sf_dir).documents
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("token_count"))
    )


@query(
    "text_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-ish (BPE-style pre-tokenization) token count via regex
    extraction — the cheap token-budget estimator for training pipelines."""
    docs = TableRegistry(spark, sf_dir).documents
    return docs.select(
        "doc_id", T.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens")
    )


@query(
    "text_tfidf",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                x -> x != '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
           round(tf.tf * ln(n.n_docs / dfreq.df), 6) AS tf_idf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    WHERE dfreq.df >= 2
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF as DataFrame algebra (explode → tf agg → df agg → join),
    min_df=2 vocabulary pruning. Two hash shuffles on high-cardinality
    keys — word-count scaling."""
    docs = TableRegistry(spark, sf_dir).documents
    out = T.tf_idf(docs, min_df=2)
    return out.withColumn("tf_idf", F.round("tf_idf", 6))


@query(
    "text_winnow_fingerprints",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(nt) >= 8
                  THEN [md5(substring(nt, i, 8)) FOR i IN range(1, len(nt) - 6)]
                  ELSE [md5(nt)] END AS hs
      FROM t
    ), w AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4
                  THEN [list_min(hs[j:j+3]) FOR j IN range(1, len(hs) - 2)]
                  ELSE [list_min(hs)] END AS wins
      FROM g
    )
    SELECT DISTINCT doc_id, unnest(wins) AS fp FROM w
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints, k=8 w=4, exploded to
    (doc, fingerprint) rows — the substring-level dedup/plagiarism primitive
    (any shared substring >= 11 chars shares a fingerprint). Oracle matches
    the window-min selection exactly via md5-hex lexicographic order."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.with_winnow_fingerprints(docs, "text", k=8, w=4).select(
        "doc_id", F.explode("fps").alias("fp")
    ).distinct()


@query(
    "text_chunking",
    oracle="""
    WITH nonempty AS (
      SELECT doc_id, text FROM documents WHERE length(text) > 0
    ), offs AS (
      SELECT doc_id, text,
             UNNEST(generate_series(0, length(text) - 1, 160)) AS off,
             CAST(generate_subscripts(
                    generate_series(0, length(text) - 1, 160), 1) - 1
                  AS INTEGER) AS chunk_idx
      FROM nonempty
    )
    SELECT doc_id, chunk_idx,
           substr(text, CAST(off + 1 AS INTEGER), 200) AS chunk_text,
           CAST(length(substr(text, CAST(off + 1 AS INTEGER), 200)) AS INTEGER)
             AS chunk_len
    FROM offs
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: 200-char chunks with 40-char overlap, one
    row per chunk. Pure per-row sequence+posexplode+substring expressions —
    a map-only stage at any scale (operators/text.py chunk_documents)."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.chunk_documents(docs, chunk_chars=200, overlap_chars=40)


@query(
    "text_repetition",
    oracle=f"""
    WITH d AS (
      -- signals per DISTINCT document, fanned back out per input row:
      -- per-doc_id gram/word counts would otherwise pool duplicated
      -- rows' tokens and halve the distinct ratios (dup audit)
      SELECT DISTINCT doc_id, text FROM documents
    ), toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS w FROM d
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 2
                  THEN 1 - CAST(len(list_distinct(
                         [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
                       )) AS DOUBLE) / (len(w) - 1)
                  ELSE 0.0 END AS dup_2gram_fraction
      FROM toks
    ), wc AS (
      SELECT doc_id, UNNEST(w) AS word FROM toks
    ), counts AS (
      SELECT doc_id, word, COUNT(*) AS c FROM wc GROUP BY doc_id, word
    ), ds AS (
      SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct, MAX(c) AS top
      FROM counts GROUP BY doc_id
    )
    SELECT doc.doc_id,
           CAST(COALESCE(ds.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(ds.n_distinct, 0) AS BIGINT) AS n_distinct_words,
           CASE WHEN ds.n_words > 0
                THEN CAST(ds.n_distinct AS DOUBLE) / ds.n_words
                ELSE 0.0 END AS distinct_word_ratio,
           CASE WHEN ds.n_words > 0
                THEN CAST(ds.top AS DOUBLE) / ds.n_words
                ELSE 0.0 END AS top_word_fraction,
           g.dup_2gram_fraction
    FROM documents doc
    JOIN grams g ON doc.doc_id = g.doc_id
    LEFT JOIN ds ON g.doc_id = ds.doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate signals per document: distinct-word
    ratio, top-word (mode) fraction, duplicate-2-gram fraction. The mode
    is computed distributively (explode → per-(doc,word) count → per-doc
    re-agg), never a per-doc sort (operators/text.py repetition_signals)."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.repetition_signals(docs)


@query(
    "text_pii_redaction",
    oracle="""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1555-00' || CAST(doc_id AS VARCHAR)
                  || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
               AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'),
             '\\+?[0-9][0-9\\-()]{6,}[0-9]', '<PHONE>', 'g') AS text
    FROM injected
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub certified against the oracle on text with deterministic
    synthetic PII appended (an email, a phone, an IP derived from each
    doc_id — so every row exercises every pattern). The patterns are
    RE2/Java-compatible and applied email→IP→phone in both engines
    (operators/text.py redact_pii)."""
    docs = TableRegistry(spark, sf_dir).documents
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1555-00"),
            F.col("doc_id").cast("string"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".17"),
        ).alias("text"),
    )
    return T.redact_pii(injected)


@query(
    "text_pack_bins",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_DUCK_TOKS}) AS n_tokens FROM documents
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (
                  PARTITION BY source ORDER BY doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_tokens) / 512.0) AS BIGINT) AS bin_id
    FROM t
    """,
)
def text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: per-source shards fill 512-token
    training bins greedily in doc_id order — one running-sum window per
    shard, parallel across shards like per-worker packing in practice
    (operators/text.py pack_token_bins)."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.pack_token_bins(docs, budget=512)


@query(
    "corpus_mix_report",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
    FROM documents
    WHERE {duck_key_hash("doc_id", 1000)} <
          CASE WHEN source IN ('src0', 'src1') THEN 1000
               WHEN source IN ('src2', 'src3') THEN 100
               ELSE 400 END
    GROUP BY source
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalance audit: per-source deterministic sampling
    rates (keep all of two curated sources, 10% of two noisy ones, 40%
    default), reported as surviving docs + token budget per source. The
    mix is a scan-level CASE filter over the key hash
    (operators/sampling.py) — membership stable across reruns and
    repartitioning, which is what makes training mixes reproducible."""
    from datalake_nba_dmc_spark.operators.sampling import sample_stratified

    docs = TableRegistry(spark, sf_dir).documents
    mixed = sample_stratified(
        docs,
        key_col="doc_id",
        stratum_col="source",
        rates={"src0": 1.0, "src1": 1.0, "src2": 0.1, "src3": 0.1},
        default_rate=0.4,
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH d AS (
      -- histogram per DISTINCT document, fanned back out per input row:
      -- the operator is a map-only per-ROW pass, so a bare GROUP BY
      -- doc_id would pool duplicated rows' characters (dup audit)
      SELECT DISTINCT doc_id, text FROM documents WHERE length(text) > 0
    ), ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM d
    ), cnt AS (
      SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2
    ), agg AS (
      SELECT doc_id,
             CAST(SUM(k) AS BIGINT) AS n_chars,
             COUNT(*) AS n_distinct_chars,
             CAST(SUM(CAST(round(k * ln(k) * 1000000.0) AS BIGINT)) AS BIGINT) AS s
      FROM cnt GROUP BY 1
    )
    SELECT doc.doc_id, agg.n_chars, agg.n_distinct_chars,
           least(greatest(
             round(ln(agg.n_chars) - (CAST(agg.s AS DOUBLE) / 1000000.0)
                   / agg.n_chars, 6),
             0.0), round(ln(agg.n_distinct_chars), 6))
             AS char_entropy_nats
    FROM documents doc JOIN agg ON doc.doc_id = agg.doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (gibberish / encoded-blob
    detector) — one Arrow-batched map-only pass, zero shuffle
    (operators/text.char_entropy). The SQL twin has to explode a row per
    CHARACTER to express the same histogram — the plan shape the operator
    exists to avoid."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.char_entropy(docs.select("doc_id", "text")).select(
        "doc_id", "n_chars", "n_distinct_chars", "char_entropy_nats"
    )


@query(
    "corpus_resample_balanced",
    oracle=f"""
    WITH totals AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
      FROM documents GROUP BY source
    ), thr AS (
      SELECT source,
             CAST((SELECT MIN(w) FROM totals) * 1000000 // w AS BIGINT) AS t
      FROM totals
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE {duck_key_hash("d.doc_id", 1000000)} < thr.t
    ORDER BY d.doc_id
    """,
)
def corpus_resample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalance: downsample every source to the smallest
    source's total char mass, membership decided by the portable key hash
    (operators/sampling.resample_balanced). Thresholds are exact integer
    divisions broadcast back onto the corpus — the corpus itself is never
    shuffled."""
    from datalake_nba_dmc_spark.operators.sampling import resample_balanced

    docs = TableRegistry(spark, sf_dir).documents
    return (
        resample_balanced(docs, "doc_id", "source", "n_chars")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH h AS (
      SELECT lang,
             {_duck_lang_hits(T.LANG_MARKERS['de'])} AS h_de,
             {_duck_lang_hits(T.LANG_MARKERS['en'])} AS h_en,
             {_duck_lang_hits(T.LANG_MARKERS['es'])} AS h_es,
             {_duck_lang_hits(T.LANG_MARKERS['fr'])} AS h_fr
      FROM documents
    )
    SELECT lang,
           CASE WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           COUNT(*) AS n_docs
    FROM h GROUP BY 1, 2
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID QA: confusion matrix of the declared ``lang`` column vs
    the detector's prediction — the accuracy report a curation run ships
    with. One expression projection + one tiny hash agg (cells ≤ langs²)."""
    docs = TableRegistry(spark, sf_dir).documents
    return (
        T.lang_id(docs)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH c AS (
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token
    ), t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM c
    ), top AS (
      SELECT token, n FROM c ORDER BY n DESC, token LIMIT 500
    )
    SELECT token, CAST(n AS BIGINT) AS token_count,
           ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / (SELECT total FROM t) AS cum_share
    FROM top
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage report: the top-500 tokens by exact corpus
    frequency with each prefix's cumulative share of all tokens — the
    how-big-must-the-vocab-be curve tokenizer work starts from.

    Scale shape: wordcount hash-agg (map-side combined), then a
    DISTRIBUTED top-k (orderBy+limit plans as TakeOrderedAndProject — no
    global sort of the vocabulary); only the 500 survivors enter the
    single-partition ranking window, and the grand total joins in as a
    broadcast one-row literal."""
    docs = TableRegistry(spark, sf_dir).documents
    counts = (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("token_count"))
    )
    total = counts.agg(F.sum("token_count").alias("_total"))
    top = counts.orderBy(F.col("token_count").desc(), F.col("token").asc()).limit(500)
    w = Window.orderBy(F.col("token_count").desc(), F.col("token").asc())
    cum = Window.orderBy(F.col("token_count").desc(), F.col("token").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "token_count",
            F.row_number().over(w).alias("rank"),
            (F.sum("token_count").over(cum).cast("double") / F.col("_total")).alias(
                "cum_share"
            ),
        )
    )


@query(
    "text_collocations",
    oracle=r"""
    WITH t AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ), nt AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_toks FROM uni
    ), bi AS (
      SELECT unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                     FOR i IN range(1, len(toks))]) AS s
      FROM t WHERE len(toks) >= 2
    ), bc AS (
      SELECT s.w1 AS w1, s.w2 AS w2, COUNT(*) AS c_xy FROM bi GROUP BY 1, 2
    ), np AS (
      SELECT CAST(SUM(c_xy) AS BIGINT) AS n_pairs FROM bc
    )
    SELECT bc.w1, bc.w2, bc.c_xy,
           round(ln((CAST(bc.c_xy AS DOUBLE) * nt.n_toks * nt.n_toks)
                    / (CAST(np.n_pairs AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
    FROM bc
    JOIN uni ua ON bc.w1 = ua.w
    JOIN uni ub ON bc.w2 = ub.w
    CROSS JOIN nt CROSS JOIN np
    WHERE bc.c_xy >= 5
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram PMI collocations over the corpus (operators/text.
    collocations) — multiword-expression mining as pure word-count
    algebra: two hash aggs, two broadcast scalars, one ln per survivor."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.collocations(docs, min_count=5)


@query(
    "text_gopher_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks,
             list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS lines
      FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                  AS BIGINT) AS sum_len,
             len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...')))
               AS n_symbol,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
             len(list_filter(toks, x -> lower(x) IN
                 ('the','be','to','of','and','that','have','with'))) AS n_stop,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
               AS n_bullet,
             len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$')))
               AS n_ellipsis
      FROM t
    ), r AS (
      SELECT doc_id,
             CAST(n_words AS BIGINT) AS n_words,
             CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words END
               AS mean_word_chars,
             CASE WHEN n_words > 0 THEN n_symbol / n_words ELSE 0.0 END
               AS symbol_word_ratio,
             CASE WHEN n_lines > 0 THEN n_bullet / n_lines ELSE 0.0 END
               AS bullet_line_frac,
             CASE WHEN n_lines > 0 THEN n_ellipsis / n_lines ELSE 0.0 END
               AS ellipsis_line_frac,
             CASE WHEN n_words > 0 THEN n_alpha / n_words ELSE 0.0 END
               AS alpha_word_frac,
             CAST(n_stop AS BIGINT) AS n_stop_hits
      FROM s
    )
    SELECT doc_id, n_words, mean_word_chars, symbol_word_ratio,
           bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
           CAST(coalesce(
               n_words BETWEEN 50 AND 100000
               AND mean_word_chars BETWEEN 3.0 AND 10.0
               AND symbol_word_ratio < 0.1
               AND bullet_line_frac < 0.9
               AND ellipsis_line_frac < 0.3
               AND alpha_word_frac > 0.8
               AND n_stop_hits >= 2, false) AS INTEGER) AS gopher_pass
    FROM r
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery (operators/text.gopher_quality): the standard
    structural pre-training filters as one map-only codegen'd projection —
    exact-integer counts and int/int ratio divisions keep both engines
    bit-identical, so even the conjunctive pass flag hash-matches."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.gopher_quality(docs).select(
        "doc_id", "n_words", "mean_word_chars", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_stop_hits", "gopher_pass",
    )


@query(
    "text_unigram_logprob",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), dw AS (
      SELECT doc_id, w, COUNT(*) AS n_dw
      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2
    ), vocab AS (
      SELECT w, CAST(SUM(n_dw) AS BIGINT) AS c_w FROM dw GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c_w) AS BIGINT) AS t_total FROM vocab
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.n_dw) AS BIGINT) AS n_tokens,
           round((CAST(SUM(dw.n_dw * CAST(round(
                      ln(CAST(vocab.c_w AS DOUBLE) / CAST(tot.t_total AS DOUBLE))
                      * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
                 / CAST(SUM(dw.n_dw) AS BIGINT), 6) AS avg_logprob
    FROM dw JOIN vocab USING (w) CROSS JOIN tot
    GROUP BY dw.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality score (operators/text.
    unigram_logprob): per-doc average log-probability under the corpus's
    own unigram distribution — shuffles O(distinct (doc, word)) rows, the
    grand total rides as a broadcast literal, per-token terms are exact
    micro-nat int64s so the doc sums are order-free."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.unigram_logprob(docs)


@query(
    "text_heavy_hitters",
    oracle=f"""
    SELECT token, token_count FROM (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS token_count
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token
    ) ORDER BY token_count DESC, token ASC LIMIT 20
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 corpus tokens WITHOUT a full-vocabulary shuffle
    (operators/frequent.heavy_hitters_exact): per-partition Misra–Gries
    summaries bound the candidate set to cap×partitions items, then a
    broadcast semi-join recounts candidates exactly — shuffle
    O(candidates), not O(|vocab|), and the counts (hence this oracle
    comparison) are EXACT. The oracle's plan is the naive full
    explode-group-sort this operator exists to avoid at 100 TB."""
    from datalake_nba_dmc_spark.operators.frequent import heavy_hitters_exact

    docs = TableRegistry(spark, sf_dir).documents
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    return heavy_hitters_exact(toks, "token", k=20).select(
        "token", "item_count"
    ).withColumnRenamed("item_count", "token_count")


@query(
    "text_sentence_boilerplate",
    oracle="""
    WITH sent AS (
      SELECT DISTINCT doc_id, trim(s) AS sentence
      FROM (SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s
            FROM documents)
      WHERE trim(s) != ''
    ), dfreq AS (
      SELECT sentence, COUNT(*) AS dfc FROM sent GROUP BY 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(SUM(CASE WHEN dfc > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           round(CAST(SUM(CASE WHEN dfc > 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS boiler_share
    FROM sent JOIN dfreq USING (sentence)
    GROUP BY doc_id
    """,
)
def text_sentence_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level boilerplate share per document (operators/text.
    sentence_boilerplate_stats): the fraction of a doc's distinct
    sentences appearing in more than 3 documents corpus-wide — cookie
    banners and templated footers repeat as whole sentences long before
    they dominate shingle statistics. Distinct (doc, sentence) rows → one
    document-frequency hash agg → join back; the TF-IDF cost class."""
    from datalake_nba_dmc_spark.operators.text import sentence_boilerplate_stats

    docs = TableRegistry(spark, sf_dir).documents
    return sentence_boilerplate_stats(docs)


@query(
    "text_source_lang_diversity",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ), t AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY source
    )
    SELECT c.source,
           CAST(MAX(t.tot) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           -- + 0.0 canonicalizes IEEE negative zero: a single-language
           -- source has SUM(p·ln p) = 0 and -SUM = -0.0 in DuckDB where
           -- Spark emits +0.0 — the value-hash distinguishes them
           -- (found by the r7 skew audit's monolingual hot source)
           round(-SUM((CAST(c.n AS DOUBLE) / t.tot)
                      * ln(CAST(c.n AS DOUBLE) / t.tot)) + 0.0, 6)
             AS lang_entropy
    FROM c JOIN t USING (source)
    GROUP BY c.source
    """,
)
def text_source_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix diversity: Shannon entropy of each
    source's declared-language distribution — the corpus-assembly metric
    that flags monolingual crawls pretending to be diverse (entropy 0)
    vs genuinely mixed sources. Two tiny hash aggregates over
    (source, lang) cells; entropy terms rounded to 6 dp (the tf_idf ln
    rule) so the engines hash-match."""
    docs = TableRegistry(spark, sf_dir).documents
    c = docs.groupBy("source", "lang").agg(F.count("*").cast("long").alias("n"))
    t = c.groupBy("source").agg(F.sum("n").cast("long").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.max("tot").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
    )


@query(
    "text_length_deciles",
    oracle="""
    WITH counts AS (
      SELECT length(text) AS v, COUNT(*) AS c
      FROM documents WHERE text IS NOT NULL GROUP BY 1
    ), cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum_c,
             SUM(c) OVER () AS n
      FROM counts
    ), probes AS (SELECT unnest(range(1, 10)) AS d)
    SELECT d AS decile,
           CAST(MIN(CASE WHEN cum_c * 10 >= d * n THEN v END) AS BIGINT)
             AS len_at_decile
    FROM cum CROSS JOIN probes
    GROUP BY d
    """,
)
def text_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length-distribution deciles: for each decile d, the
    smallest document length whose cumulative count reaches d/10 of the
    corpus — the curriculum/batch-shape profile, via the integer-exact
    discrete-quantile pattern (cum_c·10 ≥ d·n keeps every comparison in
    integer arithmetic; no percentile interpolation to drift
    cross-engine). One (length → count) agg + a window over distinct
    lengths + a 9-row probe explode."""
    from pyspark.sql import Window

    docs = TableRegistry(spark, sf_dir).documents.filter(F.col("text").isNotNull())
    counts = docs.groupBy(F.length("text").alias("v")).agg(
        F.count("*").alias("c")
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = counts.select(
        "v",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    probes = docs.sparkSession.range(1, 10).select(F.col("id").alias("d"))
    return (
        cum.crossJoin(F.broadcast(probes))
        .groupBy(F.col("d").alias("decile"))
        .agg(
            F.min(
                F.when(F.col("cum_c") * 10 >= F.col("d") * F.col("n"), F.col("v"))
            )
            .cast("long")
            .alias("len_at_decile")
        )
    )


@query(
    "text_quality_classifier",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), dw AS (
      SELECT doc_id, w, COUNT(*) AS n_dw
      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2
    ), vocab AS (
      SELECT w, CAST(SUM(n_dw) AS BIGINT) AS c_w,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM dw GROUP BY w
    ), top20 AS (
      SELECT w, 1000000 AS wt FROM vocab
      ORDER BY c_w DESC, w ASC LIMIT 20
    ), weights AS (
      SELECT w, wt FROM top20
      UNION ALL
      SELECT v.w, -500000 AS wt FROM vocab v
      WHERE v.df = 1 AND v.w NOT IN (SELECT w FROM top20)
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.n_dw) AS BIGINT) AS n_tokens,
           round((CAST(SUM(dw.n_dw * coalesce(weights.wt, 0)) AS BIGINT) / 1e6)
                 / CAST(SUM(dw.n_dw) AS BIGINT), 6) AS logit
    FROM dw LEFT JOIN weights USING (w)
    GROUP BY dw.doc_id
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (operators/text.vocab_logit_score —
    the FineWeb-Edu/DCLM linear-classifier shape): every document scored
    by a (word → weight) table via one count shuffle + a broadcast
    vocabulary join; weights quantize to 1e-6 longs so partial sums are
    exact int64 and the logit hash-matches across engines. The weight
    table here is derived deterministically from the corpus itself so the
    whole chain is oracle-checkable: the 20 highest-total-count words
    score +1.0 (ties broken on word asc) and single-document words score
    −0.5 (noise proxy) — a stand-in for trained weights, exercising the
    identical plan a trained table would."""
    docs = TableRegistry(spark, sf_dir).documents
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    dw = (
        docs.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("n_dw"))
    )
    vocab = dw.groupBy("w").agg(
        F.sum("n_dw").alias("c_w"), F.count("*").alias("df")
    )
    top20 = (
        vocab.orderBy(F.col("c_w").desc(), F.col("w").asc())
        .limit(20)
        .select("w", F.lit(1.0).alias("weight"))
    )
    rare = (
        vocab.filter(F.col("df") == 1)
        .join(top20.select("w"), on="w", how="left_anti")
        .select("w", F.lit(-0.5).alias("weight"))
    )
    weights = top20.unionByName(rare).withColumnRenamed("w", "word")
    return T.vocab_logit_score(docs, weights)


@query(
    "text_dsir_selection",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), dw AS (
      SELECT doc_id, w, COUNT(*) AS n_dw
      FROM (SELECT doc_id, unnest(toks) AS w FROM tok) GROUP BY 1, 2
    ), vr AS (
      SELECT w, CAST(SUM(n_dw) AS BIGINT) AS c_r FROM dw GROUP BY w
    ), tt AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c_t0
      FROM (SELECT unnest(toks) AS w FROM tok WHERE lang = 'en')
      GROUP BY w
    ), vocab AS (
      SELECT vr.w, vr.c_r, COALESCE(tt.c_t0, 0) AS c_t
      FROM vr LEFT JOIN tt USING (w)
    ), tot AS (
      SELECT CAST(SUM(c_r) AS BIGINT) AS n_r,
             CAST(SUM(c_t) AS BIGINT) AS n_t,
             COUNT(*) AS v
      FROM vocab
    ), scored AS (
      SELECT dw.doc_id,
             CAST(SUM(dw.n_dw) AS BIGINT) AS n_tokens,
             round(CAST(SUM(dw.n_dw * (
                 CAST(round(ln(CAST(vocab.c_t + 1 AS DOUBLE)
                              / CAST(tot.n_t + tot.v AS DOUBLE)) * 1e6)
                      AS BIGINT)
               - CAST(round(ln(CAST(vocab.c_r + 1 AS DOUBLE)
                              / CAST(tot.n_r + tot.v AS DOUBLE)) * 1e6)
                      AS BIGINT)
             )) AS BIGINT) / 1e6, 6) AS dsir_logratio
      FROM dw JOIN vocab USING (w) CROSS JOIN tot
      GROUP BY dw.doc_id
    )
    SELECT doc_id, n_tokens, dsir_logratio FROM scored
    ORDER BY dsir_logratio DESC, doc_id ASC LIMIT 100
    """,
)
def text_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style domain-targeted selection (Xie et al. 2023; operators/
    text.dsir_importance): English docs as the target distribution, the
    whole corpus as raw; keep the 100 docs whose unigram log-ratio
    ``log p_T − log p_R`` is highest (ties → doc_id). Micro-nat integer
    terms make the doc sums order-free; ORDER BY + LIMIT compiles to
    TakeOrdered (no global sort)."""
    docs = TableRegistry(spark, sf_dir).documents
    scored = T.dsir_importance(
        docs.select("doc_id", "text"),
        docs.filter(F.col("lang") == "en").select("text"),
    )
    return scored.orderBy(
        F.col("dsir_logratio").desc(), F.col("doc_id").asc()
    ).limit(100)


@query(
    "text_bpe_pair_counts",
    oracle=r"""
    WITH wf AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(
                     regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '')) AS w
            FROM documents)
      GROUP BY 1
    ), syms AS (
      SELECT freq,
             list_concat(
               string_split(word, '')[1:length(word)-1],
               [word[-1] || '</w>']) AS cs
      FROM wf
    ), pairs AS (
      SELECT freq,
             unnest(list_transform(range(1, len(cs)),
                                   i -> cs[i] || ' ' || cs[i+1])) AS pair
      FROM syms
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair ASC LIMIT 40
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-prep statistic (Sennrich et al. 2016; operators/
    bpe.pair_counts): the 40 heaviest adjacent symbol pairs over the
    corpus's word-frequency table — the quantity a BPE merge step
    maximizes. Corpus collapses to O(|vocab|) rows in one explode +
    hash-agg; pair generation is a codegen'd transform over each word's
    own symbol array (length-bounded, no join)."""
    from datalake_nba_dmc_spark.operators import bpe as B

    docs = TableRegistry(spark, sf_dir).documents
    pc = B.pair_counts(B.word_freq_table(docs))
    return pc.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(40)


#: Pinned BPE merge table for the corpus-wide tokenizer-APPLICATION query:
#: the first 12 merges trained by operators/bpe.train_bpe_merges on the
#: sf0.01 documents table (deterministic — ties break on count desc, pair
#: asc), frozen here as literals so BOTH twins apply the SAME tokenizer
#: and the query is a pure function of its input at every sf. Includes a
#: second-order merge ('p','ar') that consumes the product of ('a','r') —
#: exercising the rank-order dependence the oracle must replicate.
_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r</w>"), ("o", "w</w>"), ("t", "o"), ("a", "t"),
    ("l", "u"), ("a", "s"), ("i", "n"), ("e", "r"),
    ("o", "r"), ("a", "r"), ("p", "ar"), ("i", "n</w>"),
]

#: The merge table as a DuckDB struct-list literal, ORDERED BY RANK so
#: ``list_filter(...)[1]`` is the min-rank applicable merge.
_BPE_MERGES_SQL = "[" + ", ".join(
    "{'a': '%s', 'b': '%s'}" % (a.replace("'", "''"), b.replace("'", "''"))
    for a, b in _BPE_MERGES
) + "]"


@query(
    "text_bpe_segment",
    oracle=f"""
    WITH RECURSIVE wf AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(
                     regexp_split_to_array(lower(text), '\\s+'),
                     x -> x != '')) AS w
            FROM documents)
      GROUP BY 1
    ), init AS (
      SELECT word, freq,
             ' ' || array_to_string(list_concat(
                      string_split(word, '')[1:length(word)-1],
                      [word[-1] || '</w>']), ' ') || ' ' AS s
      FROM wf
    ), seg AS (
      SELECT word, freq, s, 0 AS step FROM init
      UNION ALL
      SELECT word, freq,
             substring(s, 1, p - 1) || ' ' || mm['a'] || mm['b'] || ' '
               || substring(s, p + length(mm['a']) + length(mm['b']) + 3),
             step + 1
      FROM (
        SELECT word, freq, s, step,
               list_filter({_BPE_MERGES_SQL},
                 x -> position(' ' || x['a'] || ' ' || x['b'] || ' ' IN s) > 0
               )[1] AS mm
        FROM seg
      ), LATERAL (SELECT position(' ' || mm['a'] || ' ' || mm['b'] || ' ' IN s)
                    AS p)
      WHERE mm IS NOT NULL
    ), final AS (
      SELECT word, max_by(s, step) AS s, max_by(freq, step) AS freq
      FROM seg GROUP BY word
    )
    SELECT subword, CAST(SUM(freq) AS BIGINT) AS n
    FROM (SELECT freq, unnest(string_split(trim(s), ' ')) AS subword
          FROM final)
    GROUP BY 1
    """,
)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application end-to-end (closes the loop from
    text_bpe_pair_counts to tokens-on-disk): apply the PINNED trained
    merge list corpus-wide and count every emitted subword, weighted by
    word frequency.

    Scale shape: the corpus collapses to the word-frequency table first
    (one explode + map-side-combined hash-agg — the same split every
    production BPE trainer/encoder uses), so the Arrow merge-loop UDF
    runs once per DISTINCT word, not once per token instance; the final
    subword agg is O(alphabet + merges) rows. The DuckDB twin is a
    genuinely independent implementation — a recursive CTE that replays
    rank-greedy merging (min (rank, position) per step, exactly
    operators/bpe.bpe_segment's loop) over the same pinned merge table.
    """
    from datalake_nba_dmc_spark.operators import bpe as B

    docs = TableRegistry(spark, sf_dir).documents
    wf = B.word_freq_table(docs)
    seg = B.bpe_segment(wf, _BPE_MERGES, text_col="word", out_col="subs")
    return (
        seg.select(F.explode("subs").alias("subword"), "freq")
        .groupBy("subword")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


#: The fixed retrieval query for the BM25 surface (corpus-vocabulary words;
#: both twins share this literal list).
_BM25_QUERY = ["spark", "join", "window", "customer", "stream"]


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x != '') AS t,
             text IS NOT NULL AS has_text
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs,
             AVG(CASE WHEN has_text THEN len(t) END) AS avgdl
      FROM base
    ), hits AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM base
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM hits
      WHERE term IN ({", ".join(f"'{w}'" for w in _BM25_QUERY)})
      GROUP BY 1, 2, 3
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    )
    SELECT tf.doc_id,
           round(SUM(
             ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * 2.2
                / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))
           ), 6) AS bm25
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY 1
    ORDER BY bm25 DESC, tf.doc_id ASC
    LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval (Robertson et al.; Lucene '+1' idf,
    k1=1.2, b=0.75) for a fixed 5-term query — the contamination-lookup /
    corpus-search primitive. The exploded token stream is pruned by
    ``term IN (query)`` BEFORE any shuffle, per-term document frequencies
    and the one-row (N, avgdl) corpus stats ride broadcasts, and the
    top-20 cut compiles to TakeOrderedAndProject (per-partition heaps —
    no global sort). See operators/text.bm25_scores."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.bm25_topk(docs, _BM25_QUERY, topk=20)


@query(
    "corpus_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS _n FROM documents GROUP BY 1
    ), thr AS (
      SELECT source,
             CAST(floor(sqrt(CAST((SELECT MIN(_n) FROM counts) AS DOUBLE)
                             / _n) * 1000) AS BIGINT) AS _thr
      FROM counts
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({{toks}})) AS BIGINT) AS n_tokens
    FROM documents d JOIN thr USING (source)
    WHERE {duck_key_hash("d.doc_id", 1000)} < thr._thr
    GROUP BY 1
    """.replace("{toks}", _DUCK_TOKS),
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training mix (tau=0.5 ⇒ surviving mass ∝
    sqrt(natural share) — the XLM-R-style multilingual rebalance): rates
    come FROM the per-source doc counts (one k-row agg + broadcasts, the
    corpus never shuffles) and membership from the portable key hash.
    sqrt is IEEE-correctly-rounded in both engines, so the integer
    thresholds match bit-for-bit. Reported as surviving docs + token
    budget per source. See operators/sampling.sample_temperature."""
    from datalake_nba_dmc_spark.operators.sampling import sample_temperature

    docs = TableRegistry(spark, sf_dir).documents
    mixed = sample_temperature(docs, key_col="doc_id", stratum_col="source", tau=0.5)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )


@query(
    "text_ccnet_buckets",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), dw AS (
      SELECT doc_id, w, COUNT(*) AS n_dw
      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2
    ), vocab AS (
      SELECT w, CAST(SUM(n_dw) AS BIGINT) AS c_w FROM dw GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c_w) AS BIGINT) AS t_total FROM vocab
    ), scored AS (
      SELECT dw.doc_id,
             round((CAST(SUM(dw.n_dw * CAST(round(
                        ln(CAST(vocab.c_w AS DOUBLE) / CAST(tot.t_total AS DOUBLE))
                        * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
                   / CAST(SUM(dw.n_dw) AS BIGINT), 6) AS avg_logprob
      FROM dw JOIN vocab USING (w) CROSS JOIN tot
      GROUP BY dw.doc_id
    )
    SELECT s.doc_id, d.lang,
           CASE ntile(3) OVER (PARTITION BY d.lang
                               ORDER BY s.avg_logprob DESC, s.doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scored s JOIN documents d USING (doc_id)
    """,
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's signature curation stage (Wenzek et al. 2020): split each
    language's documents into head/middle/tail TERCILES of LM quality
    (here the oracle-exact unigram avg-logprob; higher = head). ntile(3)
    over (score DESC, doc_id) per language — both engines implement ANSI
    ntile, and the 6-dp micro-nat score plus the id tiebreak make the
    order total, so buckets match bit-for-bit. Scale note: exact ntile
    sorts within each language partition; at 100 TB the standard swap-in
    is two approx-percentile thresholds + a broadcast CASE (no sort) —
    exact terciles are kept here because they ARE the differential
    contract. See operators/text.unigram_logprob."""
    from pyspark.sql import Window

    docs = TableRegistry(spark, sf_dir).documents
    scored = T.unigram_logprob(docs).select("doc_id", "avg_logprob")
    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    n = F.ntile(3).over(w)
    return (
        scored.join(docs.select("doc_id", "lang"), on="doc_id")
        .select(
            "doc_id",
            "lang",
            F.when(n == 1, "head").when(n == 2, "middle").otherwise("tail").alias("bucket"),
        )
    )


@query(
    "text_js_divergence",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                x -> x != '')) AS w
      FROM documents WHERE source IN ('src0', 'src1')
    ), counts AS (
      SELECT w,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
      FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb
      FROM counts
    ), terms AS (
      SELECT
        CASE WHEN ca > 0 THEN CAST(ca AS BIGINT) * CAST(round(
          ln((2.0 * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)))
             / (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                + CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))) * 1e6)
          AS BIGINT) ELSE 0 END AS term_a,
        CASE WHEN cb > 0 THEN CAST(cb AS BIGINT) * CAST(round(
          ln((2.0 * (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)))
             / (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                + CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))) * 1e6)
          AS BIGINT) ELSE 0 END AS term_b,
        ta, tb
      FROM counts CROSS JOIN tot
    )
    SELECT MIN(ta) AS n_tokens_a, MIN(tb) AS n_tokens_b,
           round(CAST(SUM(term_a) AS DOUBLE) / (MIN(ta) * 1e6), 6) AS kl_a,
           round(CAST(SUM(term_b) AS DOUBLE) / (MIN(tb) * 1e6), 6) AS kl_b,
           round((CAST(SUM(term_a) AS DOUBLE) / (MIN(ta) * 1e6)
                  + CAST(SUM(term_b) AS DOUBLE) / (MIN(tb) * 1e6)) / 2.0, 6)
             AS jsd
    FROM terms
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the src0 and src1 sub-corpora's
    unigram distributions — corpus-drift QC (the text twin of
    stat_psi_price_drift). Exact-integer micro-nat terms make the vocab
    sums order-free, so both engines agree bit-for-bit; shuffle cost is
    O(|vocab|) and the corpus is scanned once. See
    operators/text.js_divergence."""
    docs = TableRegistry(spark, sf_dir).documents
    return T.js_divergence(docs, "src0", "src1")


#: The fixed retrieval WORKLOAD for the multi-query BM25 surface: four
#: queries with deliberately overlapping terms, so per-(doc,term) tf and
#: per-term df sharing across queries is actually exercised. Both twins
#: share these literals.
_BM25_WORKLOAD = [
    ("q_join", "spark join window"),
    ("q_cust", "customer stream batch"),
    ("q_sort", "hash merge sort table"),
    ("q_scan", "slow query filter scan spark"),
]


@query(
    "text_bm25_multiquery",
    oracle=f"""
    WITH workload(query_id, query_text) AS (VALUES
      {", ".join(f"('{q}', '{t}')" for q, t in _BM25_WORKLOAD)}
    ), qterms AS (
      SELECT DISTINCT query_id, unnest(
        list_filter(string_split_regex(lower(query_text), '\\s+'), x -> x != '')
      ) AS term
      FROM workload
    ), base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x != '') AS t,
             text IS NOT NULL AS has_text
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs,
             AVG(CASE WHEN has_text THEN len(t) END) AS avgdl
      FROM base
    ), hits AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM base
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM hits
      WHERE term IN (SELECT term FROM qterms)
      GROUP BY 1, 2, 3
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), scores AS (
      SELECT qterms.query_id, tf.doc_id,
             round(SUM(
               ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * 2.2
                  / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))
             ), 6) AS bm25
      FROM tf JOIN dfreq USING (term)
              JOIN qterms USING (term)
              CROSS JOIN stats
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, bm25, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, doc_id, bm25,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id ASC) AS rank
      FROM scores
    ) WHERE rank <= 10
    """,
)
def text_bm25_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query BM25 retrieval (VERDICT r7 ask #5): a 4-query WORKLOAD
    table scored in ONE corpus scan — query terms broadcast, the exploded
    token stream pruned by a broadcast semi-join before any shuffle,
    per-(doc,term) tf and per-term df computed once and SHARED across the
    queries that contain the term, per-query top-10 cut by a rank window
    (WindowGroupLimit — per-query heaps, no global sort). The DuckDB twin
    recomputes the whole workload from a VALUES table.
    See operators/text.bm25_multiquery."""
    docs = TableRegistry(spark, sf_dir).documents
    workload = spark.createDataFrame(_BM25_WORKLOAD, ["query_id", "query_text"])
    return T.bm25_multiquery(docs, workload, topk=10)


#: Pinned unigram-LM piece table (piece, cost_micro = round(-ln(p)·1e6)),
#: trained once by ``operators/unigram_lm.train_unigram`` (vocab 48, max
#: piece length 4, 3 hard-EM iterations, deterministic — retraining
#: reproduces it bit-for-bit). Both twins consume these literals.
_UNIGRAM_PIECES = [
    ("e", 2680860),
    ("a", 2836659),
    ("c", 2979388),
    ("l", 2991493),
    ("s", 3005290),
    ("g", 3018608),
    ("t", 3027362),
    ("h", 3216378),
    ("m", 3505150),
    ("ow", 3506241),
    ("d", 3511715),
    ("b", 3515748),
    ("r", 3522752),
    ("or", 3524975),
    ("st", 3532418),
    ("n", 3890642),
    ("o", 3891711),
    ("mer", 3900309),
    ("at", 3904093),
    ("er", 3904093),
    ("u", 3907893),
    ("al", 3914987),
    ("i", 3923788),
    ("v", 3923788),
    ("in", 3930996),
    ("f", 3936017),
    ("k", 3942188),
    ("ue", 3946700),
    ("y", 3947266),
    ("par", 3952369),
    ("join", 4552742),
    ("as", 4570515),
    ("lu", 4584323),
    ("ta", 4612525),
    ("p", 4616935),
    ("w", 4637025),
    ("ro", 4646085),
    ("q", 4654080),
    ("j", 11424870),
]

_UNIGRAM_PIECES_SQL = ", ".join(f"('{p}', {c})" for p, c in _UNIGRAM_PIECES)


@query(
    "text_unigram_lm_segment",
    oracle=f"""
    WITH RECURSIVE wf AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(
                     regexp_split_to_array(lower(text), '\\s+'),
                     x -> x != '')) AS w
            FROM documents)
      GROUP BY 1
    ), pieces(piece, cost) AS (VALUES {_UNIGRAM_PIECES_SQL}
    ), paths AS (
      SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, '' AS path FROM wf
      UNION ALL
      SELECT p.word, p.pos + length(pc.piece), p.cost + pc.cost,
             CASE WHEN p.path = '' THEN pc.piece
                  ELSE p.path || ' ' || pc.piece END
      FROM paths p JOIN pieces pc
        ON substring(p.word, p.pos + 1, length(pc.piece)) = pc.piece
      WHERE p.pos < length(p.word)
    ), best AS (
      SELECT word, path,
             row_number() OVER (PARTITION BY word ORDER BY cost, path) AS rn
      FROM paths WHERE pos = length(word)
    ), seg AS (
      SELECT wf.word, wf.freq, coalesce(best.path, '<unk>') AS path
      FROM wf LEFT JOIN best ON wf.word = best.word AND best.rn = 1
    )
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS n
    FROM (SELECT freq, unnest(string_split(path, ' ')) AS piece FROM seg)
    GROUP BY 1
    """,
)
def text_unigram_lm_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-model) tokenizer application end-to-end
    (r8 — the second tokenizer family next to BPE): segment every corpus
    word to its MINIMUM-COST piece sequence under the pinned trained
    table and count every emitted piece, weighted by word frequency.

    Determinism contract: integer micro-nat costs + exact argmin over all
    complete segmentations ordered by (total_cost, space-joined path) — a
    total order BOTH engines compute literally. The DuckDB twin is a
    genuinely independent implementation: a recursive CTE enumerates
    every segmentation path (bounded — ≤ 2^(len-1) per word, corpus max
    word length 8) and row_number picks the same argmin. Scale shape: the
    corpus collapses to the word-frequency table first, the Arrow argmin
    UDF runs once per DISTINCT word, final agg is O(vocab) rows.
    See operators/unigram_lm (training: distributed seed counts +
    driver hard-EM over the capped word table, BPE's split)."""
    from datalake_nba_dmc_spark.operators.unigram_lm import unigram_segment_counts

    docs = TableRegistry(spark, sf_dir).documents
    return unigram_segment_counts(docs, _UNIGRAM_PIECES)


@query(
    "corpus_pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x != '')) AS n
      FROM documents WHERE text IS NOT NULL
    ), nz AS (SELECT * FROM toks WHERE n > 0),
    sp AS (
      SELECT doc_id, n,
             CAST(SUM(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS e
      FROM nz
    ), spans AS (SELECT doc_id, n, e - n AS s, e FROM sp)
    SELECT doc_id, q AS seq_id,
           greatest(s, q * 64) - s AS doc_offset,
           greatest(s, q * 64) - q * 64 AS seq_offset,
           least(e, (q + 1) * 64) - greatest(s, q * 64) AS piece_len,
           n AS n_tokens
    FROM spans, UNNEST(range(s // 64, (e - 1) // 64 + 1)) AS t(q)
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/packing.pack_sequences,
    seq_len=64): every document's whitespace-token span assigned to
    fixed-length training sequences in doc_id order, one row per
    (document, sequence) piece. The sequential formulation is a global
    running offset — the textbook "one unpartitioned window" trap that
    would collapse 100 TB onto one task; the operator computes the SAME
    assignment with a two-phase parallel prefix sum (per-bucket totals →
    tiny bucket-offset window over <= 256 rows → parallel within-bucket
    running sums), plan-asserted to never window the corpus
    unpartitioned. The DuckDB twin IS the sequential running-sum +
    unnest(range) formulation, so the equality is the parallel-vs-
    sequential proof. Buckets are min-shifted double arithmetic
    (overflow-safe for xxhash64-scale ids, monotone for negative ids)."""
    from datalake_nba_dmc_spark.operators.packing import pack_sequences

    docs = TableRegistry(spark, sf_dir).documents
    return pack_sequences(docs, seq_len=64)


@query(
    "text_bigram_logprob",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), uni AS (
      SELECT COUNT(DISTINCT w) AS v
      FROM (SELECT unnest(toks) AS w FROM t)
    ), t2 AS (
      SELECT doc_id, toks FROM t WHERE len(toks) >= 2
    ), bi AS (
      SELECT doc_id,
             unnest([{'w1': toks[i], 'w2': toks[i+1]}
                     FOR i IN range(1, len(toks))]) AS p
      FROM t2
    ), pairs AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bi
    ), dbb AS (
      SELECT doc_id, w1, w2, COUNT(*) AS n_dbb FROM pairs GROUP BY 1, 2, 3
    ), big AS (
      SELECT w1, w2, CAST(SUM(n_dbb) AS BIGINT) AS c_ww
      FROM dbb GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, CAST(SUM(c_ww) AS BIGINT) AS c_w1 FROM big GROUP BY 1
    )
    SELECT dbb.doc_id,
           CAST(SUM(dbb.n_dbb) AS BIGINT) AS n_bigrams,
           CAST(SUM(dbb.n_dbb * CAST(round(
                  ln(CAST(big.c_ww + 1 AS DOUBLE)
                     / CAST(ctx.c_w1 + uni.v AS DOUBLE))
                  * 1e6) AS BIGINT)) AS BIGINT) AS sum_logprob_micro
    FROM dbb JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN uni
    GROUP BY dbb.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM quality score (operators/ngram_lm.
    bigram_logprob, registered r11) — the word-ORDER upgrade of
    text_unigram_logprob: p(w2|w1) = (c(w1 w2)+1) / (c(w1 .)+V) under
    the corpus's own bigram distribution. Shuffled rows are O(distinct
    (doc, bigram)), never O(token instances); the vocabulary size rides
    as a broadcast one-row literal; per-bigram micro-nat terms are exact
    int64 and the output stays PURE integer to the end (the sf0.1
    rounding-boundary lesson: Spark HALF_UP vs DuckDB round() disagree
    on the same double — so no final float division). The twin builds
    bigrams with a list comprehension over the token array, an
    independent formulation of the zipped-slice explode."""
    from datalake_nba_dmc_spark.operators.ngram_lm import bigram_logprob

    docs = TableRegistry(spark, sf_dir).documents
    return bigram_logprob(docs)


_C4_ORACLE = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)),
                     x -> trim(x)), x -> x != '') AS lines
  FROM documents
), k AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
             regexp_matches(l, '[.!?"]$')
             AND len(list_filter(string_split_regex(l, '\s+'),
                                 w -> w != '')) >= 5
             AND NOT contains(lower(l), 'javascript')) AS kept
  FROM t
)
SELECT doc_id,
       CAST(COALESCE(len(lines), 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(len(kept), 0) AS BIGINT) AS n_kept_lines,
       CAST(COALESCE(list_sum(list_transform(kept, x -> length(x))),
                     0) AS BIGINT) AS kept_chars,
       CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0
         END AS has_lorem,
       CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS has_brace,
       CASE WHEN len(kept) >= 3
                 AND NOT contains(lower(text), 'lorem ipsum')
                 AND NOT contains(text, '{')
            THEN 1 ELSE 0 END AS c4_keep
FROM k
"""


@query("text_c4_filters", oracle=_C4_ORACLE)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning signals (operators/text.
    c4_line_filters — Raffel et al. 2020 §2.2): a line is kept iff it
    ends in terminal punctuation, has >= 5 words, and lacks
    'javascript'; the page is discarded under 3 kept lines or on lorem
    ipsum / curly braces. Emits per-document counters + the conjunctive
    c4_keep verdict — one codegen'd map-only projection with the line
    arrays STAGED as real columns (inlined, the interpreted HOF chain
    re-evaluated per reference: measured 27x at sf0.1 — the
    with_shingles rule, fourth sighting). NULL-text rows normalize to
    all-zero signal rows on BOTH sides (coalesced here, CASE/COALESCE
    in the twin), so the no-keep verdict is total, not NULL."""
    from datalake_nba_dmc_spark.operators.text import c4_line_filters

    docs = TableRegistry(spark, sf_dir).documents
    sig = c4_line_filters(docs)
    return sig.select(
        "doc_id",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_kept_lines", F.lit(0)).alias("n_kept_lines"),
        F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        F.coalesce("has_lorem", F.lit(0)).alias("has_lorem"),
        F.coalesce("has_brace", F.lit(0)).alias("has_brace"),
        "c4_keep",
    )


def _hashed_tfidf_oracle(num_buckets: int) -> str:
    from datalake_nba_dmc_spark.operators.cdc import token_hash_sql

    th = token_hash_sql("tok", "duck")
    return rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
               x -> x != '') AS toks
      FROM documents
      WHERE text IS NOT NULL
        AND octet_length(encode(text)) = length(text)
    ), t2 AS (
      SELECT doc_id, unnest(toks) AS tok FROM t
    ), pb AS (
      SELECT doc_id, ({th}) % {num_buckets} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM t2 GROUP BY 1, 2
    ), idf AS (
      SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS bucket_df
      FROM pb GROUP BY bucket
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS nd FROM pb
    )
    SELECT pb.doc_id, pb.bucket, pb.tf, idf.bucket_df,
           CAST(pb.tf * CAST(round(ln(CAST(nd + 1 AS DOUBLE)
                / CAST(bucket_df + 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
                AS BIGINT) AS tfidf_micro
    FROM pb JOIN idf USING (bucket) CROSS JOIN n
    """


@query("text_hashed_tfidf", oracle=_hashed_tfidf_oracle(256))
def text_hashed_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick TF-IDF (operators/text.hashed_tfidf — Weinberger
    et al. 2009's feature hashing, registered r13): tokens fold into a
    FIXED 256-bucket feature space via the dialect-rendered mixer hash,
    so the feature schema never depends on the vocabulary — the
    property that lets a 100 TB corpus featurize without a vocabulary
    build or a driver-side dictionary (contrast text_tfidf, whose
    exact vocabulary IS the point). Integer micro-nat contract end to
    end: idf_micro = round(ln((N+1)/(df+1))*10^6) as a bigint, tfidf =
    tf * idf_micro — bit-exact in DuckDB (the bigram_logprob rule; no
    float column anywhere). Scale shape: one explode + one
    (doc, bucket) hash-agg (map-side combined), the <=256-row IDF
    table broadcasts back; duplication law (tf doubles, IDF table
    unchanged) pytest-pinned."""
    from datalake_nba_dmc_spark.operators.text import hashed_tfidf

    docs = TableRegistry(spark, sf_dir).documents
    return hashed_tfidf(docs)
