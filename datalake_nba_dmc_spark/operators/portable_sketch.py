"""Portable MinHash + SimHash + Count-Min — sketches whose VALUES are a
cross-engine bit-exact contract (the hll_portable treatment applied to
the LSH/SimHash dedup families and to frequency estimation).

The production MinHash path (operators/dedup.minhash_signature) hashes
shingles with ``xxhash64`` — engine-private, so its driver checks are
rows-only plus certificate twins. This module swaps exactly one
ingredient: the shingle hash becomes the dialect-rendered 32-bit integer
mixer over a position-weighted codepoint sum (operators/cdc.
token_hash_sql — plain arithmetic, no engine hash builtin). Everything
downstream is unchanged MinHash algebra: K affine permutations
``(a_i·h + b_i) mod P`` over the shingle hashes, per-document minima —
and min-merge, like HyperBall's max-merge, is associative/commutative/
idempotent, so the signatures are layout-independent BY ALGEBRA and a
DuckDB twin replays every signature value BIT-EXACTLY. Band keys (and
hence LSH candidate pairs) derive from signature slices by the same
shared arithmetic, so the whole LSH pipeline becomes full-value
oracle-able instead of certificate-only.

Like the media twins and cdc, ASCII-only is an EXPLICIT contract filter
(``octet_length = length``) applied on BOTH engines — it is what makes
codepoint arithmetic identical across JVM UTF-16 and DuckDB UTF-8.

Scale shape: identical to the production path — one map-only shingle +
fold projection (the ONE-fold-updating-K-minima shape; K separate
``array_min(transform(...))`` re-evaluated the shingle array K times,
measured 30× at 50 k docs), state K small ints per doc. Suite
registrations (``dedup_minhash_portable``, ``dedup_simhash_portable``)
are staged for the next round per the registry freeze;
tests/test_staged_oracles.py carries both DuckDB twins.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.cdc import token_hash_sql
from datalake_nba_dmc_spark.operators.dedup import (
    _MERSENNE31,
    _grams_from_tokens,
    normalize_text,
)
from datalake_nba_dmc_spark.operators.util import ensure_parallelism


def permutation_coeffs(
    num_hashes: int, seed: int = 42
) -> list[tuple[int, int]]:
    """The K affine-permutation coefficients, seeded — generated ONCE in
    Python and embedded as literals in BOTH engines' expressions, so the
    twin replays the identical permutations."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]


def minhash_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Portable MinHash signatures: one row per (``id_col``, h_idx,
    sig_value) for every ASCII-contract document with >= ``shingle_n``
    tokens. ``sig_value`` = min over the doc's word shingles of
    ``(a_i · mixer_hash(shingle) + b_i) mod P`` — every value bit-exact
    vs the DuckDB twin."""
    coeffs = permutation_coeffs(num_hashes, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b) for _, b in coeffs])
    init = F.array_repeat(F.lit(_MERSENNE31).cast("long"), num_hashes)
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    staged = (
        ensure_parallelism(
            df.filter(
                F.col(text_col).isNotNull()
                & (F.octet_length(text_col) == F.length(text_col))
            )
        )
        .withColumn("_toks", toks)
        .withColumn("_sh", _grams_from_tokens(F.col("_toks"), shingle_n))
        .filter(F.size("_sh") > 0)
        # shingle hashes staged as their own column (with_shingles rule)
        .withColumn(
            "_shh",
            F.expr(
                "transform(_sh, s -> "
                + token_hash_sql("s", "spark")
                + f" % {_MERSENNE31})"
            ),
        )
    )

    def step(acc, h):
        return F.zip_with(
            acc,
            F.zip_with(
                a_arr, b_arr, lambda a, b: F.pmod(h * a + b, F.lit(_MERSENNE31))
            ),
            lambda cur, cand: F.least(cur, cand),
        )

    sig = staged.select(
        id_col, F.aggregate("_shh", init, step).alias("_sig")
    )
    return sig.select(
        id_col, F.posexplode("_sig").alias("h_idx", "sig_value")
    ).select(
        id_col,
        F.col("h_idx").cast("long").alias("h_idx"),
        F.col("sig_value").cast("long").alias("sig_value"),
    )


def simhash_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
) -> DataFrame:
    """Portable SimHash: one row per ASCII-contract non-empty document —
    (``id_col``, ``simhash``), where ``simhash`` is the ``n_bits``-bit
    sign-aggregate of mixer token hashes (every token OCCURRENCE votes
    ±1 per bit; bit j of the signature is 1 iff the per-bit sum is
    ≥ 0, Charikar 2002). With the dialect-rendered mixer as the token
    hash, the whole signature — not a certificate band — replays
    bit-exactly in DuckDB. n_bits ≤ 32 (the mixer emits 32 bits).

    ONE fold updates all ``n_bits`` running sums at once (the
    minhash_signature lesson: per-bit ``transform`` re-scans the token
    array n_bits times). Near-dup use is the production SimHash's
    banded-pigeonhole join, unchanged."""
    if not 1 <= n_bits <= 32:
        raise ValueError("n_bits must be in [1, 32]")
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    staged = (
        ensure_parallelism(
            df.filter(
                F.col(text_col).isNotNull()
                & (F.octet_length(text_col) == F.length(text_col))
            )
        )
        .withColumn("_toks", toks)
        .filter(F.size("_toks") > 0)
        .withColumn(
            "_th",
            F.expr(
                "transform(_toks, tok -> " + token_hash_sql("tok", "spark") + ")"
            ),
        )
    )
    sums = F.expr(
        f"aggregate(_th, array_repeat(CAST(0 AS BIGINT), {n_bits}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {n_bits - 1}), "
        "(a, j) -> a + ((h div CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1))"
    )
    sig = F.expr(
        f"aggregate(zip_with(_sums, sequence(0, {n_bits - 1}), "
        "(s, j) -> CASE WHEN s >= 0 THEN CAST(pow(2, j) AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a, v) -> a + v)"
    )
    return (
        staged.withColumn("_sums", sums)
        .select(id_col, sig.alias("simhash"))
    )


def _cms_col_sql(h: str, a: int, b: int, width: int) -> str:
    """Row hash of the Count-Min sketch: affine permutation of the mixer
    token hash, folded to a column index. Dialect-free (the caller
    renders ``h`` per dialect). The hash is reduced mod P BEFORE the
    multiply — the raw mixer emits up to 2^32-1 and ``a`` runs to ~2^31,
    whose product reaches 2^63 and overflows int64; reduced, the product
    stays under 2^62 (the same reduction minhash_portable applies)."""
    return f"(((({h}) % {_MERSENNE31}) * {a} + {b}) % {_MERSENNE31}) % {width}"


def cms_counters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Portable Count-Min sketch (Cormode & Muthukrishnan 2005 — public)
    over token OCCURRENCES: → (row_idx, col_idx, cnt), the full d×w
    counter matrix, every count bit-exact vs the DuckDB twin.

    Counter (i, j) = number of token occurrences with
    ``((a_i·mixer(tok) + b_i) mod P) mod w = j`` — the same seeded
    literal-embedded affine permutations as :func:`minhash_portable`.

    Scale shape: tokens explode once, each occurrence fans out ``depth``
    (row, col) keys, then ONE hash aggregation whose group count is
    capped at d·w REGARDLESS of corpus size or token skew — a hot token
    folds into map-side partial counts like any other (the property that
    makes CMS the frequency sketch for 100 TB streams, vs exact
    per-token counts whose group cardinality is the vocabulary). Shard
    sketches merge by plain addition of counters; estimates are
    ``min_i counter[i][h_i(t)]`` and can only OVERcount (inner-product
    collisions add, never subtract) — the certificate law the suite
    twin pins."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    coeffs = permutation_coeffs(depth, seed)
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    th = token_hash_sql("tok", "spark")
    cols = ", ".join(_cms_col_sql("_h", a, b, width) for a, b in coeffs)
    return (
        ensure_parallelism(
            df.filter(
                F.col(text_col).isNotNull()
                & (F.octet_length(text_col) == F.length(text_col))
            )
        )
        .select(F.explode(toks).alias("tok"))
        # token hash staged as a real column: the array-of-columns
        # expression below references it depth times (with_shingles rule)
        .withColumn("_h", F.expr(th))
        .select(
            F.posexplode(F.expr(f"array({cols})")).alias(
                "row_idx", "col_idx"
            )
        )
        .groupBy(
            F.col("row_idx").cast("long").alias("row_idx"),
            F.col("col_idx").cast("long").alias("col_idx"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    depth: int = 4,
    width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Top-``k`` tokens by exact count with their Count-Min estimates:
    → (tok, true_cnt, cms_est), ordered-free output, deterministic
    tiebreak (count DESC, token ASC) on the top-k cut.

    The exact counts exist to CERTIFY the sketch: ``cms_est >= true_cnt``
    for every row by construction (collisions only add), and the suite
    twin replays both sides bit-exactly. At 100 TB the exact-count leg
    is exactly the expensive vocabulary-wide aggregation the sketch
    replaces — it is certificate scaffolding at gate scales, not part
    of the sketch's own cost, which is the fixed d×w counter table
    (broadcast below, never shuffled against the corpus)."""
    coeffs = permutation_coeffs(depth, seed)
    counters = cms_counters(df, text_col, id_col, depth, width, seed)
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    true_topk = (
        ensure_parallelism(
            df.filter(
                F.col(text_col).isNotNull()
                & (F.octet_length(text_col) == F.length(text_col))
            )
        )
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("tok").asc())
        .limit(k)
    )
    th = token_hash_sql("tok", "spark")
    cols = ", ".join(_cms_col_sql("_h", a, b, width) for a, b in coeffs)
    probes = (
        true_topk.withColumn("_h", F.expr(th))
        .select(
            "tok",
            "true_cnt",
            F.posexplode(F.expr(f"array({cols})")).alias(
                "row_idx", "col_idx"
            ),
        )
        .select(
            "tok",
            "true_cnt",
            F.col("row_idx").cast("long").alias("row_idx"),
            F.col("col_idx").cast("long").alias("col_idx"),
        )
    )
    return (
        probes.join(F.broadcast(counters), on=["row_idx", "col_idx"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
