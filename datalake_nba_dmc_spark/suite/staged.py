"""STAGED queries — implemented, twin-green in tests/test_staged_oracles.py,
awaiting their round's registration window (the registry freeze: operators
stage in the round they are built and register in the next, so every
CORRECTNESS row lands inside a planned window).

These are the REAL builder functions the next round's registration will
expose — kept out of ``QUERIES`` (the driver must not see them early) but
given to ``tools/robustness_audit.py`` (``load_all(include_staged=True)``)
so every staged operator faces the empty/nulls/skew/dup/partitions/spill/
codegen/bytes/retry batteries BEFORE it registers: registration arrives
pre-hardened instead of discovering audit findings in its first graded
round.

Builders use the exact parameterizations their DuckDB twins pin (the
registration is then literally a move of the dict entry plus the oracle
string). Oracle = None here: the mutated-fixture audit modes apply their
rows-only gate, the layout/spill/codegen modes their bit-identity gate —
the full-value differential stays the staged twins' job.

The r13 slate (graph_coreness_bucketed, dedup_exactsubstr_pipeline,
stat_ks_drift_by_segment, stat_mann_whitney_by_segment,
stat_exact_quantiles_by_segment, sketch_theta_vocab_difference,
events_asof_within_tolerance, events_trailing_window_features,
sim_int8_dot_topk, sample_leakage_safe_split) REGISTERED in r14 —
builders and oracles now live in their suite modules. The r14 slate
below stages the next batch (registers r15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.suite import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.sources import TableRegistry

    return TableRegistry(spark, sf_dir).documents


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.sources import TableRegistry

    return TableRegistry(spark, sf_dir).orders


def _stat_psi_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import psi_binned_by

    return psi_binned_by(
        _orders(spark, sf_dir),
        "o_orderpriority",
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date"),
        "o_totalprice",
        lo=0.0,
        hi=600000.0,
        nbins=10,
    )


def _sim_ivf_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.similarity import ivf_sq8_topk
    from datalake_nba_dmc_spark.sources import TableRegistry
    from datalake_nba_dmc_spark.suite.similarity import (
        _recall_check,
        sim_bruteforce_topk,
    )

    emb = TableRegistry(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim_bruteforce_topk(spark, sf_dir)
    approx = ivf_sq8_topk(emb, queries, k=10, n_centroids=16, n_probe=4)
    return _recall_check(approx, exact, floor=3)


def _sample_eval_decontaminated_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.dedup import (
        contamination_hits,
        contamination_hits_bloom,
    )
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        leakage_safe_split,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    split = leakage_safe_split(corpus)
    # two-stage screen: the fixed-size Bloom sketch flags a SUPERSET
    # (no false negatives — the dedup_contamination_bloom certificate),
    # the exact counter re-checks only the flagged docs
    screen = contamination_hits_bloom(corpus, ev, "text", n=3)
    flagged = corpus.join(
        screen.select("doc_id"), on="doc_id", how="left_semi"
    )
    exact = contamination_hits(flagged, ev, "text", n=3)
    joined = split.join(exact, on="doc_id", how="left")
    n_hits = F.coalesce("n_hits", F.lit(0)).cast("long")
    return joined.select(
        "doc_id",
        "cluster_id",
        "split",
        n_hits.alias("n_eval_hits"),
        F.when(
            (F.col("split") == "train") & (n_hits > 0), F.lit("quarantine")
        )
        .otherwise(F.col("split"))
        .alias("final_split"),
    )


def _stat_bootstrap_ci_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import bootstrap_ci_mean_by

    return bootstrap_ci_mean_by(
        _orders(spark, sf_dir),
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
    )


def _events_trailing_windows_multi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.temporal import (
        trailing_window_agg_multi,
    )
    from datalake_nba_dmc_spark.sources import TableRegistry

    t = TableRegistry(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts")
    purch = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return trailing_window_agg_multi(
        ev,
        purch,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="value",
        windows={"1h": "interval 1 hour", "24h": "interval 24 hours"},
    )


def staged_specs() -> dict[str, QuerySpec]:
    """The r15 registration slate as audit-runnable specs (grows as
    this round stages operators)."""
    builders: dict = {
        # per-segment PSI on the shared per-(segment, value) counts
        # substrate — completes the segment-capable drift family
        # (VERDICT r13 ask #8)
        "stat_psi_by_segment": _stat_psi_by_segment,
        # IVF probe -> exact-int8 SQ8 shortlist -> exact cosine
        # re-rank, certified against brute force (VERDICT r13 ask #6)
        "sim_ivf_sq8_recall": _sim_ivf_sq8_recall,
        # leakage-safe split composed with benchmark decontamination:
        # the eval TABLE pins its grams out of train (VERDICT r13
        # ask #7) — contaminated train docs quarantine
        "sample_eval_decontaminated_split": _sample_eval_decontaminated_split,
        # per-segment Poisson-bootstrap CI — the uncertainty primitive
        # made segment-capable like the KS/MW/PSI/quantile family
        "stat_bootstrap_ci_by_segment": _stat_bootstrap_ci_by_segment,
        # N trailing horizons in one pass: cumulative table built once,
        # one extra as-of per horizon (N+1 sorts, never a range join)
        "events_trailing_windows_multi": _events_trailing_windows_multi,
    }
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
