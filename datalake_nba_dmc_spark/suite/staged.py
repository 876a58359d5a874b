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

The r14 slate (stat_psi_by_segment, sim_ivf_sq8_recall,
sample_eval_decontaminated_split, stat_bootstrap_ci_by_segment,
events_trailing_windows_multi) REGISTERED in r15 — builders and oracles
now live in their suite modules. The r15 slate below stages the next
batch (registers r16).
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


def _events_trailing_distinct_items(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.temporal import (
        trailing_distinct_count,
    )
    from datalake_nba_dmc_spark.sources import TableRegistry

    t = TableRegistry(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts")
    purch = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    return trailing_distinct_count(
        ev,
        purch,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="item",
        window="interval 24 hours",
    )


def _sample_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        leakage_safe_split_stratified,
    )

    return leakage_safe_split_stratified(_docs(spark, sf_dir))


def _stat_drift_panel_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import drift_panel_by

    return drift_panel_by(
        _orders(spark, sf_dir),
        "o_orderpriority",
        "o_totalprice",
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date"),
        lo=0.0,
        hi=600000.0,
        nbins=10,
    )


def staged_specs() -> dict[str, QuerySpec]:
    """The r16 registration slate as audit-runnable specs (grows as
    this round stages operators)."""
    builders: dict = {
        # exact trailing-window DISTINCT count via interval stabbing —
        # the feature prefix-sum differencing cannot express
        # (VERDICT r14 ask #6)
        "events_trailing_distinct_items": _events_trailing_distinct_items,
        # stratified cluster->split assignment by cumulative mass along
        # the mixer line — doc-grain proportions hit targets under
        # cluster-size skew, leakage still impossible (r14 ask #5)
        "sample_stratified_split": _sample_stratified_split,
        # the per-segment drift dashboard: KS + MW + PSI + per-cohort
        # quantiles off ONE materialized counts frame (r14 ask #7)
        "stat_drift_panel_by_segment": _stat_drift_panel_by_segment,
    }
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
