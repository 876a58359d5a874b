"""Training-data curation pipeline: the end-to-end composition of the
extension operators — what the engine is FOR at 100 TB.

    documents
      → quality gate   (cheap codegen'd signals; C4/Gopher-style rules)
      → exact dedup    (normalized-fingerprint hash-agg, min-id winner)
      → near-dedup     (3-gram Jaccard pairs → connected components →
                        keep the min-id representative per cluster)
      → curated corpus + per-(source, lang) yield stats

Every stage is a DataFrame→DataFrame function from ``operators/``; the
pipeline only composes them, so each stage's scale shape (one shuffle per
agg/join, no quadratic pair generation, iterative components with
checkpointed lineage) is documented and tested at the operator level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import dedup as D
from datalake_nba_dmc_spark.operators.text import tokens


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_chars: int = 2000,
) -> DataFrame:
    """Keep documents with ≥ ``min_tokens`` whitespace tokens and ≤
    ``max_chars`` characters — one codegen'd filter, no shuffle."""
    return docs.filter(
        (F.size(tokens(F.col(text_col))) >= min_tokens)
        & (F.length(F.col(text_col)) <= max_chars)
    )


def sized_gram_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sz, gram) rows: one exploded 64-bit gram hash per shingle,
    each row carrying its document's total shingle count — the shared
    input shape for every exact-Jaccard join in this module."""
    return (
        D.with_shingles(docs.select(id_col, text_col), text_col, shingle_n)
        .select(id_col, F.size("sh").alias("sz"), F.explode("sh").alias("_g"))
        .select(id_col, "sz", F.xxhash64("_g").alias("gram"))
    )


def near_dup_pairs_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via the shingle-explode
    equi-join (no all-pairs). The LSH variants (``D.minhash_dedup``) are
    the drop-in replacement when the corpus outgrows the exact join.

    Grams are hashed to 64 bits BEFORE the self-join: the shuffle carries
    a fixed-width long instead of the gram string, and join comparisons
    are integer equality — measured ~20% faster at sf0.1; a 64-bit
    collision adds a spurious intersection gram at ~2^-64 per pair.

    Each exploded row CARRIES its document's shingle-set size (captured
    from the array before the explode), so Jaccard needs no separate
    per-doc sizes aggregation and no join back — one shingle evaluation,
    one self-join, one pair-grouping."""
    sh = sized_gram_rows(docs, text_col, id_col, shingle_n)
    inter = (
        sh.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "gram")
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "gram"),
            on="gram",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_inter"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
        )
    )
    return inter.filter(
        F.col("n_inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        >= threshold
    ).select("id_a", "id_b")


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: directed (id_a, id_b, containment)
    with ``C(a→b) = |A ∩ B| / |A| >= threshold`` — the ASYMMETRIC near-dup
    relation Jaccard structurally misses: a short document embedded
    verbatim inside a much longer one (a syndicated article inside an
    aggregator page, a quoted post inside a thread dump) has containment
    ≈ 1 but Jaccard ≈ |A|/|B| → 0 as the host grows (Broder 1997 defines
    both resemblance AND containment for exactly this reason). Dedup
    pipelines drop the contained side and keep the host.

    Same scale shape as :func:`near_dup_pairs_exact`: one staged shingle
    evaluation (the gram rows are reused across both join sides via an
    eager localCheckpoint — Catalyst does not share the exchange), one
    64-bit-gram equi self-join, one pair-grouping; the only differences
    are the asymmetric pair predicate (``!=`` keeps both directions, so
    A≡B yields both edges) and the one-sided denominator. The DuckDB
    twin mirrors dedup_ngram_jaccard's with ``/ sz_a``.

    SET semantics, not multiset (the documented Broder form): the gram
    rows come from ``sized_gram_rows`` → ``_grams_from_tokens``, which
    ends in ``array_distinct`` BEFORE the size capture and the explode —
    a shingle occurring j times in A and k times in B contributes
    exactly 1 to ``n_inter`` (not j·k), ``sz_a`` is the DISTINCT shingle
    count, and containment is mathematically ≤ 1 on any input, however
    repetitive (pytest-pinned: test_dedup.py
    ``test_containment_set_semantics_caps_at_one``).
    """
    sh = sized_gram_rows(docs, text_col, id_col, shingle_n).localCheckpoint(
        eager=True
    )
    return (
        sh.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "gram")
        .join(sh.select(F.col(id_col).alias("id_b"), "gram"), on="gram")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"), F.first("sz_a").alias("sz_a"))
        .filter(
            F.col("n_inter").cast("double") / F.col("sz_a") >= threshold
        )
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter").cast("double") / F.col("sz_a")).alias("containment"),
        )
    )


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_chars: int = 2000,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Full curation: quality gate → exact dedup → near-dup representative
    selection. Returns the curated corpus (original columns)."""
    q = quality_gate(docs, text_col, min_tokens, max_chars)
    exact = D.exact_dedup(q, text_col, id_col)
    pairs = near_dup_pairs_exact(exact, text_col, id_col, threshold=jaccard_threshold)
    clustered = D.dedup_clusters(exact, pairs, id_col)
    return clustered.filter(F.col("is_representative")).drop(
        "cluster_id", "is_representative"
    )


def curation_stats(docs: DataFrame, curated: DataFrame) -> DataFrame:
    """Per-(source, lang) yield: raw count, kept count, kept token total.
    Three tiny aggregates joined on the group key — the corpus is touched
    twice (raw count + kept stats), never collected."""
    raw = docs.groupBy("source", "lang").agg(F.count("*").alias("n_raw"))
    kept = curated.groupBy("source", "lang").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("tokens_kept"),
    )
    return (
        raw.join(kept, on=["source", "lang"], how="left")
        .select(
            "source",
            "lang",
            "n_raw",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
    )
