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
from datalake_nba_dmc_spark.operators.util import ensure_parallelism

#: Modulus for the position-weighted sums (2^31, matching the mixer's
#: non-negative input contract; sums stay far inside int64 before the mod).
_M = 2_147_483_648


def _token_sum_sql(tok: str, dialect: str) -> str:
    """Pre-mixer token sum: Σ ord(char_j)·j mod 2^31. The linear
    positional weight keeps every intermediate exact (no modular
    exponentiation)."""
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
    return f"({base} % {_M})"


def token_hash_sql(tok: str, dialect: str) -> str:
    """Dialect-rendered token hash: mixer(Σ ord(char_j)·j mod 2^31) —
    the avalanche mixer supplies the dispersion the divisor test needs.

    PERF NOTE (r15): the mixer's textual expansion references its input
    8× (h0 appears twice in h1, h1 twice in h2, h2 twice in the return),
    and higher-order functions evaluate INTERPRETED with no common-
    subexpression elimination — so embedding this whole expression inside
    a ``transform`` lambda re-runs the O(token-length) character fold
    eight times per token. Hot paths must stage the fold first (one
    ``transform`` producing :func:`_token_sum_sql` values) and mix the
    resulting SCALARS in a second ``transform`` — see
    :func:`_token_hashes_expr`. This single-expression form is for
    per-row (codegen-staged) use and the DuckDB oracle twins."""
    return mixer_sql(_token_sum_sql(tok, dialect), dialect)


def _token_hashes_expr(toks: str) -> str:
    """Spark-side token-hash ARRAY for a token-array column: stage the
    character folds once (inner transform), then mix the scalars (outer
    transform — the mixer's 8× textual duplication now re-reads a lambda
    variable instead of re-running the fold). Values are bit-identical
    to mapping :func:`token_hash_sql` over the tokens."""
    return (
        f"transform(transform({toks}, tok -> "
        + _token_sum_sql("tok", "spark")
        + "), s -> "
        + mixer_sql("s", "spark")
        + ")"
    )


def _boundaries_expr(th: str, divisor: int) -> str:
    """Boundary positions (0-based token index i with hash % D == 0) of a
    token-hash array column. Index-free form (zip, then filter) rather
    than filter(sequence(...), i -> th[i] ...): under default optimizer
    rules InferFiltersFromGenerate infers a filter below a spans explode,
    inlines this expression into it, and REORDERS it ahead of the
    emptiness filter — where th[i] on a token-less row throws the ANSI
    invalid-array-index error. zip_with NULL-pads instead, so the
    expression is total whatever filter order the optimizer picks."""
    return (
        f"filter(zip_with({th}, sequence(0, size({th}) - 1), "
        f"(h, i) -> CASE WHEN h % {divisor} = 0 THEN i ELSE -1 END), "
        "x -> x >= 0)"
    )


def _spans_expr(th: str, b: str) -> str:
    """Chunk (start, end) pairs from consecutive boundary positions."""
    return (
        "filter(zip_with("
        f"  concat(array(0), transform({b}, x -> x + 1)),"
        f"  concat(transform({b}, x -> x + 1), array(size({th}))),"
        "  (s, e) -> struct(s, e)), p -> p.s < p.e)"
    )


def _chunk_sum_expr(th: str, p: str = "p") -> str:
    """Position-weighted sum of member token hashes for the span struct
    ``p`` (k = 1-based position inside the chunk). Each term is
    < 2^31 · chunk_len, the sum < 2^31 · len², far inside int64 before
    the final mod. Spark sequence() is INCLUSIVE of its end (unlike
    DuckDB range): sequence(1, len) gives exactly len positions — an
    off-by-one here NULL-pads zip_with and poisons the whole sum."""
    return (
        f"aggregate(zip_with(slice({th}, {p}.s + 1, {p}.e - {p}.s), "
        f"sequence(1, {p}.e - {p}.s), "
        f"(h, k) -> (h % {_M}) * k), CAST(0 AS BIGINT), (a, v) -> a + v)"
    )


def _chunk_hashes_expr(th: str, spans: str) -> str:
    """Per-span chunk fingerprints (mixer over the position-weighted
    member-hash sum) as an ARRAY aligned with ``spans``. Two-level
    transform for the same reason as :func:`_token_hashes_expr`: the
    inner transform runs each span's O(chunk-length) fold ONCE, the
    outer mixes the scalar sums."""
    return (
        f"transform(transform({spans}, p -> "
        f"({_chunk_sum_expr(th)} % {_M})), s -> "
        f"CAST({mixer_sql('s', 'spark')} AS BIGINT))"
    )


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
    # fan out BEFORE the compute-bound token folds (the with_shingles
    # rule: a few-MB single-file corpus otherwise runs the whole chunking
    # pipeline on one core; no-op on already-parallel 100 TB scans)
    staged = (
        ensure_parallelism(df)
        .filter(
            F.col(text_col).isNotNull()
            & (F.octet_length(text_col) == F.length(text_col))
        )
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .withColumn("_th", F.expr(_token_hashes_expr("_t")))
    )
    # boundary positions then chunk (start, end) pairs from consecutive
    # boundaries (see _boundaries_expr for the total-expression rationale:
    # the engine session excludes InferFiltersFromGenerate for perf, but
    # the operator must not DEPEND on a session conf for correctness).
    chunks = staged.withColumn(
        "_b", F.expr(_boundaries_expr("_th", divisor))
    ).withColumn("_spans", F.expr(_spans_expr("_th", "_b")))
    out = chunks.select(
        id_col,
        "_th",
        F.posexplode("_spans").alias("chunk_idx", "_p"),
    )
    # chunk fingerprint: mixer over the position-weighted sum of member
    # token hashes. The sum stages as its OWN column so the mixer's 8×
    # textual duplication re-reads a column attribute instead of re-
    # running the O(chunk-length) fold (CollapseProject keeps a non-cheap
    # alias referenced 8 times staged — the with_shingles rule).
    staged_sum = out.withColumn(
        "_csum", F.expr(f"({_chunk_sum_expr('_th', p='_p')} % {_M})")
    )
    return staged_sum.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_p.s").cast("long").alias("tok_start"),
        F.col("_p.e").cast("long").alias("tok_end"),
        F.expr(mixer_sql("_csum", "spark")).cast("long").alias("chunk_hash"),
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

    Scale shape (r15): ONE tokenize+hash fold over one scan's worth of
    data, zero joins, zero explodes. The front edit only ever PREPENDS
    one token, and the per-token hash is position-free (it mixes the
    token's own characters), so the v2 snapshot's token-hash array is
    derived from the v1 fold in-plan: ``_th2 = concat([H("recrawl")],
    _th)`` with H a constant-folded literal — re-tokenizing the edited
    text would recompute the identical array (pytest-pinned). Both
    chunkings and the v1∈v2 fingerprint matching then run as per-doc
    ARRAY expressions (the chunk sets of one document are a few dozen
    elements), so the only shuffle left is the final document-grain
    hash-agg over three narrow ints. The pre-r15 shape (two full
    chunking folds + chunk-grain distincts + a LEFT SEMI join) measured
    ~6 s at sf0.1 with both folds dominating; dropping the second fold
    and every chunk-grain shuffle is the guide §2.3/§2.4 move (shuffle
    fewer bytes / remove shuffles outright). Set semantics still holds
    at chunk grain: array_distinct dedupes v1 fingerprints per doc, and
    re-delivered duplicate rows produce identical report rows that the
    document-grain MIN-agg collapses bit-identically (the dup-audit
    law). At 100 TB the v1 chunk table is the persisted artifact of the
    previous crawl — here it is derived in-plan so the query is
    self-contained and twin-able."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    staged = (
        ensure_parallelism(df)
        .filter(
            F.col(text_col).isNotNull()
            & (F.octet_length(text_col) == F.length(text_col))
        )
        .select(F.col(id_col), toks.alias("_t"))
        .withColumn("_th", F.expr(_token_hashes_expr("_t")))
        .select(id_col, "_th")
    )
    # the prepended token's hash — a literal after constant folding,
    # bit-identical to what the full fold computes for "recrawl"
    h_edit = F.expr(token_hash_sql("'recrawl'", "spark")).cast("bigint")
    both = (
        staged.withColumn(
            "_th2",
            F.when(
                F.col(id_col) % edit_every == 0,
                F.concat(F.array(h_edit), F.col("_th")),
            ).otherwise(F.col("_th")),
        )
        .withColumn("_b1", F.expr(_boundaries_expr("_th", divisor)))
        .withColumn("_b2", F.expr(_boundaries_expr("_th2", divisor)))
        .withColumn("_sp1", F.expr(_spans_expr("_th", "_b1")))
        .withColumn("_sp2", F.expr(_spans_expr("_th2", "_b2")))
        .withColumn(
            "_v1h",
            F.array_distinct(F.expr(_chunk_hashes_expr("_th", "_sp1"))),
        )
        .withColumn("_v2h", F.expr(_chunk_hashes_expr("_th2", "_sp2")))
    )
    # _v1h MUST be referenced at least twice here: a non-cheap alias
    # referenced once gets inlined by CollapseProject — and an inline
    # into the filter LAMBDA re-evaluates the whole v1 fingerprint
    # pipeline once PER v2 CHUNK (measured: 7 s → 85 s at sf0.1 before
    # this guard). size(_v1h) >= 0 is always true (transform arrays are
    # never NULL here); its only job is the second reference that pins
    # _v1h as a staged column.
    per_row = both.select(
        id_col,
        F.size("_v2h").alias("_nc"),
        F.when(
            F.size("_v1h") >= 0,
            F.size(F.expr("filter(_v2h, h -> array_contains(_v1h, h))")),
        ).alias("_nr"),
    )
    # document-grain agg: duplicated input rows carry IDENTICAL (_nc,
    # _nr) values (one text per id — the documented contract), so MIN
    # reproduces the chunk-grain-distinct semantics bit-identically.
    # The zero-token exclusion filters AFTER the agg, on the aggregate
    # output: a pre-agg filter on _nc gets predicate-pushed below the
    # projections, where the substituted size(<whole _v2h pipeline>) > 0
    # predicate re-evaluates every fold per row OUTSIDE the staged
    # columns (measured: +4 s at sf0.1); an aggregate-output predicate
    # cannot be pushed, and dropping the handful of zero-chunk docs
    # post-shuffle moves three ints each.
    collapsed = per_row.groupBy(id_col).agg(
        F.min("_nc").cast("long").alias("n_chunks"),
        F.min("_nr").cast("long").alias("n_reused"),
    ).filter(F.col("n_chunks") > 0)
    return collapsed.select(
        id_col,
        ((F.col(id_col) % edit_every) == 0).cast("int").alias("edited"),
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_reused").cast("long").alias("n_reused"),
        F.expr(
            "(coalesce(n_reused, 0) * 1000000) div greatest(n_chunks, 1)"
        ).alias("reused_ppm"),
    )
