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


def staged_specs() -> dict[str, QuerySpec]:
    """The r15 registration slate as audit-runnable specs (grows as
    this round stages operators)."""
    builders: dict = {}
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
