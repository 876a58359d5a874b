"""STAGED queries — implemented, twin-green in tests/test_staged_oracles.py,
awaiting their round's registration window (the registry freeze: operators
stage in the round they are built and register in the next, so every
CORRECTNESS row lands inside a planned window).

These are the REAL builder functions the next round's registration will
expose — kept out of ``QUERIES`` (the driver must not see them early) but
given to ``tools/robustness_audit.py`` (``load_all(include_staged=True)``)
so every staged operator faces the empty/nulls/skew/dup/partitions/spill/
codegen batteries BEFORE it registers: registration arrives pre-hardened
instead of discovering audit findings in its first graded round.

Builders use the exact parameterizations their DuckDB twins pin (the
registration is then literally a move of the dict entry plus the oracle
string). Oracle = None here: the mutated-fixture audit modes apply their
rows-only gate, the layout/spill/codegen modes their bit-identity gate —
the full-value differential stays the staged twins' job.

The r11 slate (text_c4_filters, graph_label_propagation, dedup_cdc_chunks,
dedup_minhash_portable + _clusters, dedup_simhash_portable,
graph_connected_components, graph_triangle_count, sketch_cms_counters,
sketch_cms_heavy_hitters, stat_bootstrap_ci, graph_coreness) REGISTERED in
r12 — builders and oracles now live in their suite modules. The r12 slate
below stages the next batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.suite import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.sources import TableRegistry

    return TableRegistry(spark, sf_dir).documents


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the graph suite's derived link graph (suite/graph.py:_edges)
    return _docs(spark, sf_dir).select(
        (F.col("doc_id") % 101).alias("src"),
        (F.expr("doc_id div 101") % 101).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def _stat_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import ks_two_sample
    from datalake_nba_dmc_spark.sources import TableRegistry

    return ks_two_sample(
        TableRegistry(spark, sf_dir).orders,
        "o_totalprice",
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date"),
    )


def _text_hashed_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.text import hashed_tfidf

    return hashed_tfidf(_docs(spark, sf_dir))


def _dedup_span_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.dedup import (
        substring_span_suppress,
    )

    return substring_span_suppress(
        _docs(spark, sf_dir), window_tokens=8, min_docs=2
    )


def _graph_hyperball_m64_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.hyperball import (
        hyperball_harmonic_estimate,
    )

    return hyperball_harmonic_estimate(
        _edges(spark, sf_dir), n_rounds=3, m=64
    )


def _stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import mann_whitney_u
    from datalake_nba_dmc_spark.sources import TableRegistry

    return mann_whitney_u(
        TableRegistry(spark, sf_dir).orders,
        "o_totalprice",
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date"),
    )


def _sketch_theta_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        kmv_theta_vocab,
    )

    return kmv_theta_vocab(_docs(spark, sf_dir), k=16)


def _sketch_theta_vocab_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        kmv_theta_vocab_overlap,
    )

    return kmv_theta_vocab_overlap(_docs(spark, sf_dir), k=16)


def _dedup_cdc_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.cdc import cdc_reuse_report

    return cdc_reuse_report(_docs(spark, sf_dir), divisor=16, edit_every=3)


def staged_specs() -> dict[str, QuerySpec]:
    """The r13 registration slate as audit-runnable specs."""
    builders = {
        # exact Mann-Whitney U / AUC (doubled-midrank integer contract,
        # same two-phase prefix-sum substrate as stat_ks_drift)
        "stat_mann_whitney": _stat_mann_whitney,
        # portable KMV/theta distinct-vocabulary sketch per source
        # (k=16 < per-source vocab so the theta estimator path is live)
        "sketch_theta_vocab": _sketch_theta_vocab,
        # theta set operations: pairwise shared/union vocabulary
        # estimates — what mergeable HLL counters cannot answer
        "sketch_theta_vocab_overlap": _sketch_theta_vocab_overlap,
        # re-crawl chunk-reuse accounting: the query that cashes in
        # CDC's edit-stability promise end to end (set semantics)
        "dedup_cdc_reuse": _dedup_cdc_reuse,
        # exact two-sample KS drift (sup-norm companion to stat_psi),
        # two-phase-prefix-sum ECDF, integer cross-multiplied contract
        "stat_ks_drift": _stat_ks_drift,
        # hashing-trick TF-IDF: fixed-width vocab-free features,
        # integer micro-nat contract end to end
        "text_hashed_tfidf": _text_hashed_tfidf,
        # ExactSubstr cut-list APPLICATION: per-doc kept/cut accounting
        "dedup_span_suppress": _dedup_span_suppress,
        # the m>32 HyperBall path as a standing driver query (VERDICT
        # r11 ask #6 — m=64 twin pinned in tests/test_hyperball.py)
        "graph_hyperball_m64_est": _graph_hyperball_m64_est,
    }
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
