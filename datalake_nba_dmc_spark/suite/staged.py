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

The r12 slate (stat_ks_drift, stat_mann_whitney, text_hashed_tfidf,
dedup_span_suppress, graph_hyperball_m64_est, sketch_theta_vocab,
sketch_theta_vocab_overlap, dedup_cdc_reuse) REGISTERED in r13 —
builders and oracles now live in their suite modules. The r13 slate
below stages the next batch (registers r14).
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


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.sources import TableRegistry

    return TableRegistry(spark, sf_dir).orders


def _graph_coreness_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.graph import (
        coreness_micro_bucketed,
    )

    return coreness_micro_bucketed(_edges(spark, sf_dir), n_rounds=8)


def _dedup_exactsubstr_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.dedup import mask_repeated_spans

    return mask_repeated_spans(
        _docs(spark, sf_dir), n=8, min_count=2
    ).select("doc_id", "masked_text", "n_tokens_removed")


def _split(F_):
    return F_.col("o_orderdate") < F_.lit("1998-01-01").cast("date")


def _stat_ks_drift_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import ks_two_sample_by

    return ks_two_sample_by(
        _orders(spark, sf_dir), "o_orderpriority", "o_totalprice", _split(F)
    )


def _stat_mann_whitney_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import mann_whitney_u_by

    return mann_whitney_u_by(
        _orders(spark, sf_dir), "o_orderpriority", "o_totalprice", _split(F)
    )


def _sketch_theta_vocab_difference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        kmv_theta_vocab_difference,
    )

    return kmv_theta_vocab_difference(_docs(spark, sf_dir), k=16)


def _events_asof_within_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.temporal import asof_join_within
    from datalake_nba_dmc_spark.operators.windows import top1_per_group
    from datalake_nba_dmc_spark.sources import TableRegistry

    t = TableRegistry(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts")
    purch = top1_per_group(
        t.events.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("pt"),
            F.col("event_id").alias("purchase_event_id"),
        ),
        ["user_id", "pt"],
        [F.col("purchase_event_id").desc()],
    )
    return asof_join_within(
        ev,
        purch,
        key="user_id",
        left_ts="ts",
        right_ts="pt",
        right_cols=["purchase_event_id"],
        tolerance="interval 1 hour",
    )


def _events_trailing_window_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.temporal import (
        trailing_window_agg,
    )
    from datalake_nba_dmc_spark.sources import TableRegistry

    t = TableRegistry(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts")
    purch = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return trailing_window_agg(
        ev,
        purch,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="value",
        window="interval 1 hour",
    )


def _stat_exact_quantiles_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import exact_quantiles_by

    return exact_quantiles_by(
        _orders(spark, sf_dir),
        "o_orderpriority",
        "o_totalprice",
        probs_pct=(25, 50, 75, 90, 99),
    )


def _sim_int8_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.similarity import int8_dot_topk
    from datalake_nba_dmc_spark.sources import TableRegistry

    return int8_dot_topk(
        TableRegistry(spark, sf_dir).embeddings, k=5, n_queries=8
    )


def _sample_leakage_safe_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        leakage_safe_split,
    )

    return leakage_safe_split(_docs(spark, sf_dir))


def staged_specs() -> dict[str, QuerySpec]:
    """The r14 registration slate as audit-runnable specs."""
    builders = {
        # the skew-safe bucketed-histogram h-index coreness — the
        # executed 100 TB path (VERDICT r12 ask #3), bit-equal to the
        # windowed path per round (pytest law at two scales)
        "graph_coreness_bucketed": _graph_coreness_bucketed,
        # ExactSubstr generation -> cut-list -> suppression as ONE
        # pipeline emitting the masked corpus (VERDICT r12 ask #7)
        "dedup_exactsubstr_pipeline": _dedup_exactsubstr_pipeline,
        # per-segment drift scan: exact KS per o_orderpriority on the
        # per-segment two-phase prefix-sum substrate
        "stat_ks_drift_by_segment": _stat_ks_drift_by_segment,
        # per-segment stochastic dominance: exact U/AUC per segment,
        # U-sum law per segment
        "stat_mann_whitney_by_segment": _stat_mann_whitney_by_segment,
        # theta set DIFFERENCE |A \\ B| — completes the theta algebra
        # (union/intersection registered r13)
        "sketch_theta_vocab_difference": _sketch_theta_vocab_difference,
        # as-of join with max-staleness tolerance (pandas merge_asof /
        # kdb wj semantics): time-since-last-purchase capped at 1 hour
        "events_asof_within_tolerance": _events_asof_within_tolerance,
        # windowed-join aggregate (kdb wj): purchases-in-the-last-hour
        # per event via prefix-sum differencing (two as-of passes,
        # NO range explosion, no per-left-row window re-scan)
        "events_trailing_window_features": _events_trailing_window_features,
        # exact nearest-rank quantiles per segment WITHOUT sorting the
        # corpus (rank-cut over the per-segment prefix-sum grid) — the
        # exact counterpart to percentile_approx
        "stat_exact_quantiles_by_segment": _stat_exact_quantiles_by_segment,
        # exact int8-quantized dot-product top-k: the first similarity
        # query with a FULL-VALUE cross-engine oracle (int64 dots of
        # per-vector symmetric int8 codes — no float accumulation)
        "sim_int8_dot_topk": _sim_int8_dot_topk,
        # near-dup-aware train/val/test split: split by LSH CLUSTER id
        # so near-duplicates can never straddle an eval boundary —
        # leakage impossible by construction, split adds zero shuffles
        "sample_leakage_safe_split": _sample_leakage_safe_split,
    }
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
