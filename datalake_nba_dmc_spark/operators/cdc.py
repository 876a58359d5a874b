"""Content-defined chunking (CDC) of token streams — the storage-dedup
boundary trick (LBFS, Muthitacharoen et al. SOSP'01; FastCDC, Xia et al.
ATC'16 — both public) applied to text at token granularity.

Fixed-size chunking breaks under insertion: one added token shifts every
later boundary, so nothing downstream deduplicates. CDC instead places a
boundary wherever a HASH OF THE CONTENT ITSELF satisfies a divisor test
(``hash(token) % D == 0``), so an edit only moves boundaries inside its
own chunk — every other chunk's (start, end, hash) survives verbatim.
For an LLM corpus this gives edit-stable chunk identities: re-crawled
pages with small diffs share most chunk hashes with their previous crawl,
so chunk-level dedup (exact hash join) removes the unchanged bulk without
any similarity machinery. Expected chunk length = ``divisor`` tokens.

Determinism contract (cross-engine twin-able): the per-token hash is the
dialect-rendered 32-bit avalanche mixer (operators/hyperball.mixer_sql —
plain integer arithmetic, no engine hash builtin) over a position-
weighted codepoint sum ``Σ ord(c_j)·j`` (exact small integers). The chunk
fingerprint mixes the position-weighted sum of member token hashes. Both
sides therefore reproduce every boundary and every fingerprint
BIT-EXACTLY. Like the media twins, ASCII-only is an EXPLICIT contract
filter (``octet_length = length``) applied on BOTH engines — it is what
makes codepoint arithmetic identical across JVM UTF-16 and DuckDB UTF-8,
not an assumption (the r7 U+1D54A lesson).

Scale shape: one map-only projection — per-doc array expressions, no
shuffle, no UDF; the output explodes one row per chunk. Chunk-level
dedup afterwards is the exact-dedup hash-agg shape. Suite registration
(``dedup_cdc_chunks``) is staged for the next round per the registry
freeze; tests/test_staged_oracles.py carries the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.hyperball import mixer_sql

#: Modulus for the position-weighted sums (2^31, matching the mixer's
#: non-negative input contract; sums stay far inside int64 before the mod).
_M = 2_147_483_648


def token_hash_sql(tok: str, dialect: str) -> str:
    """Dialect-rendered token hash: mixer(Σ ord(char_j)·j mod 2^31).
    The linear positional weight keeps every intermediate exact (no
    modular exponentiation), and the avalanche mixer supplies the
    dispersion the divisor test needs."""
    if dialect == "spark":
        base = (
            f"aggregate(zip_with(split({tok}, ''), "
            f"sequence(1, char_length({tok})), "
            "(c, j) -> CAST(ascii(c) AS BIGINT) * j), "
            "CAST(0 AS BIGINT), (a, v) -> a + v)"
        )
    else:
        base = (
            f"CAST(COALESCE(list_sum(list_transform("
            f"range(1, length({tok}) + 1), "
            f"j -> ord(substr({tok}, CAST(j AS INTEGER), 1)) * j)), 0) "
            "AS BIGINT)"
        )
    return mixer_sql(f"({base} % {_M})", dialect)


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    divisor: int = 16,
) -> DataFrame:
    """Chunk every (ASCII-contract) document at content-defined token
    boundaries: a boundary falls AFTER token i whenever
    ``token_hash(i) % divisor == 0``. Returns one row per chunk:
    (``id_col``, chunk_idx, tok_start, tok_end, chunk_hash) — token
    offsets, end exclusive, ``chunk_hash`` = mixer of the
    position-weighted member-token-hash sum (the chunk's dedup key).
    Documents with zero tokens produce no rows."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    staged = (
        df.filter(
            F.col(text_col).isNotNull()
            & (F.octet_length(text_col) == F.length(text_col))
        )
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .withColumn(
            "_th",
            F.expr(
                "transform(_t, tok -> " + token_hash_sql("tok", "spark") + ")"
            ),
        )
    )
    # boundary positions (0-based token index i with hash % D == 0),
    # then chunk (start, end) pairs from consecutive boundaries.
    # Index-free form (zip, then filter) rather than
    # filter(sequence(...), i -> _th[i] ...): under default optimizer
    # rules InferFiltersFromGenerate infers a filter below the spans
    # explode, inlines this expression into it, and REORDERS it ahead of
    # the emptiness filter — where _th[i] on a token-less row throws the
    # ANSI invalid-array-index error. zip_with NULL-pads instead, so the
    # expression is total whatever filter order the optimizer picks (the
    # engine session excludes that rule for perf, but the operator must
    # not DEPEND on a session conf for correctness).
    chunks = staged.withColumn(
        "_b",
        F.expr(
            "filter(zip_with(_th, sequence(0, size(_th) - 1), "
            f"(h, i) -> CASE WHEN h % {divisor} = 0 THEN i ELSE -1 END), "
            "x -> x >= 0)"
        ),
    ).withColumn(
        "_spans",
        F.expr(
            "filter(zip_with("
            "  concat(array(0), transform(_b, x -> x + 1)),"
            "  concat(transform(_b, x -> x + 1), array(size(_th))),"
            "  (s, e) -> struct(s, e)), p -> p.s < p.e)"
        ),
    )
    out = chunks.select(
        id_col,
        "_th",
        F.posexplode("_spans").alias("chunk_idx", "_p"),
    )
    # chunk fingerprint: mixer over the position-weighted sum of member
    # token hashes (k = 1-based position inside the chunk). Each term is
    # < 2^31 · chunk_len, the sum < 2^31 · len², far inside int64 before
    # the final mod.
    chunk_sum = (
        # Spark sequence() is INCLUSIVE of its end (unlike DuckDB range):
        # sequence(1, len) gives exactly len positions — an off-by-one
        # here NULL-pads zip_with and poisons the whole sum
        "aggregate(zip_with(slice(_th, _p.s + 1, _p.e - _p.s), "
        "sequence(1, _p.e - _p.s), "
        f"(h, k) -> (h % {_M}) * k), CAST(0 AS BIGINT), (a, v) -> a + v)"
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_p.s").cast("long").alias("tok_start"),
        F.col("_p.e").cast("long").alias("tok_end"),
        F.expr(mixer_sql(f"({chunk_sum} % {_M})", "spark"))
        .cast("long")
        .alias("chunk_hash"),
    )


def cdc_reuse_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    divisor: int = 16,
    edit_every: int = 3,
) -> DataFrame:
    """Re-crawl chunk-reuse accounting — the query that cashes in CDC's
    edit-stability promise end to end. A deterministic second snapshot
    is derived in-plan (every ``edit_every``-th document by id gets one
    token prepended — the FRONT edit that shifts every boundary of
    fixed-size chunking), both snapshots are CDC-chunked, and each v2
    chunk is checked for an exact-fingerprint match in the same
    document's v1 chunk set. → one row per ASCII-contract tokenized
    document: (``id_col``, edited, n_chunks, n_reused,
    reused_ppm = n_reused·10^6 div n_chunks).

    Contract: unedited documents reuse EVERYTHING (n_reused ==
    n_chunks — a pinned law, the sanity check that the fingerprints are
    content-defined at all); edited documents lose only the chunks the
    edit actually touches (the pytest edit-stability law: most
    fingerprints survive a front edit — with fixed-size chunking the
    reuse would be ZERO). Set semantics live at CHUNK grain, not row
    grain: re-delivered rows chunk to IDENTICAL (id, idx, hash)
    triples, which the chunk-level distincts collapse, so the report
    keeps its document grain bit-identically under the dup audit (like
    minhash_portable_clusters) WITHOUT ever shuffling the text column.
    The contract assumes each id maps to one text per delivery (the
    documents-table invariant); a feed that ships two DIFFERENT texts
    under one id needs an upstream (id, text) resolution first —
    chunk-grain distinct would merge any triples the variants share.

    Scale shape: two map-only chunking projections over one scan's
    worth of data, one (doc, hash)-grained LEFT SEMI join (chunk rows,
    never token rows), one per-doc aggregate. Set semantics is enforced
    AT CHUNK GRAIN (distinct over narrow (doc, idx, hash) int triples),
    never by a distinct over the text column — a full-text shuffle is
    exactly the cost this operator's 100 TB posture forbids (measured:
    the text-distinct draft ran 8.5 s at sf0.1; this shape ~6 s, all of
    it the two inherent chunking folds). At 100 TB the v1 chunk table
    is the persisted artifact of the previous crawl — here it is
    derived in-plan so the query is self-contained and twin-able."""
    base = df.filter(
        F.col(text_col).isNotNull()
        & (F.octet_length(text_col) == F.length(text_col))
    ).select(id_col, text_col)
    v2_text = F.when(
        F.col(id_col) % edit_every == 0,
        F.concat(F.lit("recrawl "), F.col(text_col)),
    ).otherwise(F.col(text_col))
    v1 = cdc_chunks(base, text_col, id_col, divisor).select(
        id_col, "chunk_hash"
    ).distinct()
    # distinct at (doc, idx, hash): duplicated input rows chunk to
    # IDENTICAL triples, so the report's document grain survives
    # re-delivered data bit-identically (the dup-audit law)
    v2 = (
        cdc_chunks(
            base.select(id_col, v2_text.alias(text_col)),
            text_col,
            id_col,
            divisor,
        )
        .select(id_col, "chunk_idx", "chunk_hash")
        .distinct()
    )
    reused = v2.join(v1, on=[id_col, "chunk_hash"], how="left_semi")
    counts = v2.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    n_reused = reused.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_reused")
    )
    return (
        counts.join(n_reused, on=id_col, how="left")
        .select(
            id_col,
            ((F.col(id_col) % edit_every) == 0).cast("int").alias("edited"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.coalesce("n_reused", F.lit(0)).cast("long").alias("n_reused"),
            F.expr(
                "(coalesce(n_reused, 0) * 1000000) div greatest(n_chunks, 1)"
            ).alias("reused_ppm"),
        )
    )
