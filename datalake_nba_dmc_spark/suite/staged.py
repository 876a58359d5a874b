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


def staged_specs() -> dict[str, QuerySpec]:
    """The r14 registration slate as audit-runnable specs (filled as
    this round stages operators)."""
    builders: dict = {}
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
